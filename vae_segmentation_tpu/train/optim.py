"""Optimizers + parameter-freezing masks.

The reference freezes modules by setting requires_grad=False and keeping them
in eval() (main_target.py:396-406); gradients still flow THROUGH frozen
modules into trainable ones (e.g. through the frozen VAE into the Seg,
joint_model.py:450). The JAX-native equivalent: differentiate the whole
parameter pytree, then mask updates to zero on frozen subtrees with
optax.multi_transform — no stop_gradient anywhere.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import optax

TRAIN = "train"
FREEZE = "freeze"


class MaskedTransform(NamedTuple):
    """optax.GradientTransformation plus the freezing predicate that produced
    it. The train steps read `is_frozen` to mark frozen leaves as constants
    (stop_gradient) inside the loss, so XLA never builds their weight-gradient
    computations — e.g. the frozen VAE's kernel-grad convs in the adaptation
    step (~1x VAE-forward of pure waste otherwise). Updates for those leaves
    are zero either way; the numbers are identical."""

    init: Callable
    update: Callable
    is_frozen: Callable[[tuple], bool]


def path_keys(path) -> tuple:
    """jax key-path -> tuple of plain str/int keys."""
    return tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)


def stop_gradient_frozen(params, tx):
    """Return `params` with every leaf the optimizer will never update
    wrapped in stop_gradient. Gradients still flow THROUGH frozen modules
    (chain rule via their outputs); only d(loss)/d(frozen leaf) disappears —
    which the optimizer was zeroing anyway."""
    is_frozen = getattr(tx, "is_frozen", None)
    if is_frozen is None:
        return params
    return jax.tree_util.tree_map_with_path(
        lambda path, p: jax.lax.stop_gradient(p)
        if is_frozen(path_keys(path)) else p,
        params,
    )


def sgd(lr: float, momentum: float = 0.9, weight_decay: float = 0.0):
    """torch.optim.SGD semantics (main_source.py:279-280): buf = m*buf + g,
    p -= lr*buf — which is exactly optax.sgd's trace."""
    tx = optax.sgd(lr, momentum=momentum if momentum else None)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def adam(lr: float, b1: float = 0.9, b2: float = 0.999,
         weight_decay: float = 0.0):
    """torch.optim.Adam (main_target.py:347-349)."""
    tx = optax.adam(lr, b1=b1, b2=b2)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def freeze_by_path(tx, params, is_frozen: Callable[[tuple], bool]):
    """Wrap `tx` so that parameters whose tree path satisfies `is_frozen`
    receive zero updates. Paths are tuples of str keys from the root."""

    def label_tree(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: FREEZE if is_frozen(path_keys(path)) else TRAIN,
            p,
        )

    wrapped = optax.multi_transform({TRAIN: tx, FREEZE: optax.set_to_zero()},
                                    label_tree(params))
    return MaskedTransform(wrapped.init, wrapped.update, is_frozen)


def freeze_vae(tx, params):
    """Adaptation default: VAE frozen, Seg trainable
    (main_target.py:396-399)."""
    return freeze_by_path(tx, params, lambda path: path[0] == "Vae")


def freeze_all_but_seg_head(tx, params):
    """--fix_layer: only Seg.up5 and Seg.out_block train
    (main_target.py:400-406); the VAE stays frozen too."""

    def is_frozen(path):
        if path[0] != "Seg":
            return True
        return path[1] not in ("up5", "out_block")

    return freeze_by_path(tx, params, is_frozen)


def freeze_vae_encoder(tx, params):
    """refine_vae: freeze the VAE encoder half (in_block, down1-5, fc_mean,
    fc_std), train the decoder (main_source.py:347-353). Works both on a bare
    ShapeVAE tree and on a Joint tree containing 'Vae'."""
    encoder_names = {"in_block", "down1", "down2", "down3", "down4", "down5",
                     "fc_mean", "fc_std"}

    def is_frozen(path):
        sub = path[1] if path[0] == "Vae" else path[0]
        return sub in encoder_names

    return freeze_by_path(tx, params, is_frozen)


def build(adam_flag: bool, lr: float, weight_decay: float = 0.0,
          momentum: float = 0.9):
    """The trainers' optimizer switch (main_target.py:347-352)."""
    return adam(lr, weight_decay=weight_decay) if adam_flag \
        else sgd(lr, momentum=momentum, weight_decay=weight_decay)
