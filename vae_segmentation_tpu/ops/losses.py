"""Losses & metrics, as pure jnp functions.

Behavioral parity targets (reference, cited file:line):
  * soft Dice `dice`                  — utils/evaluation.py:6-7
  * per-sample-per-class `avg_dsc`    — utils/evaluation.py:48-80
    (a second copy with eps=1e-4 lives in main_source.py:150-182; the eps is
    therefore a parameter here, defaulting to the evaluation.py value)
  * `KLloss`                          — utils/evaluation.py:42-45
  * `binarize` / `confident_binarize` — utils/evaluation.py:9-18
  * `avg_ce` (BCE)                    — utils/evaluation.py:29-39

Layout: class axis is LAST (TPU-native NDHWC); masks are [B, D, H, W, C].
The reference uses NCDHW ([B, C, D, H, W]); axis bookkeeping is the only
difference — reductions are over the spatial axes either way.

All reductions accumulate in float32 regardless of input dtype (inputs may be
bf16 activations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# eps used by utils/evaluation.py:72-79 (the target-domain trainer)
EVAL_EPS = 1e-6
# eps used by the duplicated copy in main_source.py:174-181 (source trainer)
SOURCE_EPS = 1e-4

_SPATIAL = (1, 2, 3)  # D, H, W axes of a [B, D, H, W, C] tensor


def _reduce_axes(x: jax.Array):
    """All axes except batch (0) and class (last) — so the same losses work
    on [B, D, H, W, C] and on space-to-depth 6D views
    [B, D/2, H/2, W/2, 8, C] (ops/s2d.py; dice sums are fold-invariant)."""
    return tuple(range(1, x.ndim - 1))


def dice(a: jax.Array, b: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Global soft Dice over all elements (utils/evaluation.py:6-7).
    f32 accumulation without materializing f32 copies of the inputs."""
    inter = jnp.sum(a * b, dtype=jnp.float32)
    return 2.0 * inter / (jnp.sum(a, dtype=jnp.float32)
                          + jnp.sum(b, dtype=jnp.float32) + eps)


def binarize(a: jax.Array) -> jax.Array:
    """Hard threshold at 0.5 (utils/evaluation.py:9-10). Keeps the input
    dtype: 0/1 are exact in bf16, and a full-res f32 upcast would cost 2 GB
    at 128^3 batch 4."""
    return (a >= 0.5).astype(a.dtype)


def confident_binarize(a: jax.Array, hi: float = 0.8, lo: float = 0.2) -> jax.Array:
    """Push confident probabilities to {0,1}, keep the rest soft
    (utils/evaluation.py:12-18)."""
    return jnp.where(a > hi, jnp.ones((), a.dtype),
                     jnp.where(a < lo, jnp.zeros((), a.dtype), a))


def onehot_argmax(probs: jax.Array) -> jax.Array:
    """Argmax over the class axis, re-expanded to one-hot.

    Mirrors the scatter_-based binarization in utils/evaluation.py:58-64
    (class axis last here).
    """
    n_class = probs.shape[-1]
    label = jnp.argmax(probs, axis=-1)
    return jax.nn.one_hot(label, n_class, dtype=probs.dtype)


def soft_dice_per_class(source: jax.Array, target: jax.Array,
                        eps: float = EVAL_EPS) -> jax.Array:
    """Per-sample, per-class soft Dice: [B, D, H, W, C] x2 -> [B, C].

    f32 accumulation (dtype=... on the reduces) over possibly-bf16 inputs —
    no full-resolution f32 temporaries."""
    ax = _reduce_axes(source)
    inter = jnp.sum(source * target, ax, dtype=jnp.float32)
    denom = jnp.sum(source, ax, dtype=jnp.float32) \
        + jnp.sum(target, ax, dtype=jnp.float32)
    return 2.0 * inter / (denom + eps)


def avg_dsc(source: jax.Array, target: jax.Array, *,
            binary: bool = False, botindex: int = 0, topindex: int = 2,
            return_mean: bool = True, eps: float = EVAL_EPS) -> jax.Array:
    """Mean soft Dice with class-range select (utils/evaluation.py:48-80).

    source/target: [B, D, H, W, C] probabilities (or one-hot).
    binary: argmax-one-hot both masks first (the reference's eval mode).
    botindex/topindex: class slice [bot:top] taken before averaging.
    return_mean: scalar if True, per-sample [B] if False.

    Note: like the reference, when C == 1 the class-slice is skipped
    (utils/evaluation.py:68-79).
    """
    if binary:
        source = onehot_argmax(source)
        target = onehot_argmax(target)
    per_class = soft_dice_per_class(source, target, eps)  # [B, C]
    if source.shape[-1] > 1:
        per_class = per_class[:, botindex:topindex]
    if return_mean:
        return jnp.mean(per_class)
    return jnp.mean(per_class, axis=1)


def kl_loss(mean: jax.Array, std: jax.Array, eps: float = 1e-5) -> jax.Array:
    """VAE KL to a standard normal, in the reference's parameterization
    (utils/evaluation.py:42-45): mean over batch of
    0.5 * (sum std^2 + sum mean^2 - 2 * sum log(std + 1e-5))."""
    mean = mean.astype(jnp.float32)
    std = std.astype(jnp.float32)
    per_sample = 0.5 * (jnp.sum(std ** 2, axis=1)
                        + jnp.sum(mean ** 2, axis=1)
                        - 2.0 * jnp.sum(jnp.log(std + eps), axis=1))
    return jnp.mean(per_sample)


def bce(source: jax.Array, target: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Binary cross-entropy on probabilities (utils/evaluation.py:29-39,
    torch nn.BCELoss semantics: mean over all elements, inputs clamped)."""
    source = jnp.clip(source.astype(jnp.float32), eps, 1.0 - eps)
    target = target.astype(jnp.float32)
    return -jnp.mean(target * jnp.log(source) + (1.0 - target) * jnp.log1p(-source))


def one_hot_label(label: jax.Array, n_class: int,
                  dtype=jnp.bfloat16) -> jax.Array:
    """Integer label volume [B, D, H, W] -> one-hot [B, D, H, W, C].

    Mirrors the scatter_ one-hot in main_source.py:390-392 (class axis last).
    bf16 by default: 0/1 are exact, and the f32 version is a 2 GB tensor at
    128^3 batch 4 (the difference between fitting HBM and not).

    Implemented as a direct float equality compare, not jax.nn.one_hot:
    labels arrive as exact class-valued floats, and the int32 cast the
    one_hot path needs materializes s32 copies of the full volume with
    layout fixes (~4 ms/step in the round-3 trace).
    """
    classes = jnp.arange(n_class, dtype=label.dtype)
    return (label[..., None] == classes).astype(dtype)
