"""Shape-prior VAE (reference `VAE`, joint_model.py:204-272).

6-stage 3D conv encoder (8->256 channels, 128^3 -> 4^3), flatten to 16384,
fc_mean / fc_std -> latent (dim=128 in every shipped recipe,
main_source.py:250), ReLU-constrained std (joint_model.py:243), reparameterized
decode fc2(mean + z * std * scale) (joint_model.py:246-250), 6-stage decoder
with optional per-stage MC dropout (joint_model.py:255-264), softmax head.

`mid_input=True` decodes straight from a latent vector (joint_model.py:251-252).

TPU-first notes:
  * NDHWC layout; the 16384-dim bottleneck flatten is spatial-major
    (d, h, w, c) — torch checkpoints are permuted on conversion
    (see models/torch_compat.py);
  * the reparameterization draw uses the linen RNG stream 'reparam';
    decoder MC dropout uses 'dropout' and is active whenever rate > 0
    (matching torch F.dropout(training=True), joint_model.py:256-264).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_segmentation_tpu.models.blocks import (
    remat_stage,
    DEFAULT_FMAPS,
    ConvNormAct,
    Down,
    OutConv,
    Up,
    mc_dropout,
    torch_bias_init,
    torch_uniform_init,
)


def _dense(features: int, in_features: int, dtype) -> nn.Dense:
    return nn.Dense(
        features,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=torch_uniform_init("dense"),
        bias_init=torch_bias_init(in_features),
    )


class ShapeVAE(nn.Module):
    """VAE over one-hot shape masks [B, D, H, W, n_class]."""

    n_class: int = 2
    norm_type: int = 1
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dim: int = 128
    soft: bool = False
    dtype: Any = jnp.bfloat16
    bottleneck: int = 16384  # fmaps[5] * 4^3 at the 128^3 patch size

    remat: bool = True
    # space-to-depth for the lane-starved stages (ops/s2d.py); None ->
    # models.blocks.use_s2d() default. Exact math, identical param tree.
    s2d: Any = None
    # folded_io: __call__/encode take an ALREADY-FOLDED mask and decode
    # returns folded probabilities — the Joint handoff (models/joint.py)
    folded_io: bool = False

    def _s2d(self) -> bool:
        from vae_segmentation_tpu.models.blocks import use_s2d

        return use_s2d() if self.s2d is None else bool(self.s2d)

    def setup(self):
        from vae_segmentation_tpu.models.blocks import stage_wpack

        f = self.fmaps
        fold = self._s2d() and self.norm_type == 1
        wp = fold and stage_wpack(f)  # W-PACKED full-res rep (ops/s2d.py)
        CNA = remat_stage(ConvNormAct, self.remat)
        RDown = remat_stage(Down, self.remat)
        RUp = remat_stage(Up, self.remat)
        kw = dict(norm_type=self.norm_type, soft=self.soft, dtype=self.dtype)
        self.in_block = CNA(f[0], folded=fold and self.folded_io,
                            fold_input=fold and not self.folded_io,
                            wpack=wp, defer_affine=fold and not self.soft,
                            **kw)
        self.down1 = RDown(f[1], folded_in=fold, folded_out=fold,
                           wpack_in=wp, **kw)
        # 32^3-logical stage folded too (16^3 x 8*f[2] lanes) — see SegUNet
        self.down2 = RDown(f[2], folded_in=fold, folded_out=fold, **kw)
        self.down3 = RDown(f[3], folded_in=fold, **kw)
        self.down4 = RDown(f[4], **kw)
        self.down5 = RDown(f[5], **kw)
        self.fc_mean = _dense(self.dim, self.bottleneck, self.dtype)
        self.fc_std = _dense(self.dim, self.bottleneck, self.dtype)
        self.fc2 = _dense(self.bottleneck, self.dim, self.dtype)
        self.up1 = RUp(f[4], **kw)
        self.up2 = RUp(f[3], **kw)
        self.up3 = RUp(f[2], folded_out=fold, **kw)
        self.up4 = RUp(f[1], folded_in=fold, folded_out=fold, **kw)
        # decoder-final norm+relu defers into the head conv prologue (or
        # is applied inline when the MC decoder dropout is active)
        self.up5 = RUp(f[0], folded_in=fold, folded_out=fold,
                       wpack_out=wp,
                       defer_affine=fold and not self.soft, **kw)
        self.out_block = OutConv(self.n_class, dtype=self.dtype, folded=fold,
                                 wpack=wp)

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """One-hot mask -> (mean, std), std >= 0 (joint_model.py:235-243).
        With folded_io the input is already the s2d rep; otherwise the fold
        is fused into the entry conv."""
        fold = self._s2d() and self.norm_type == 1
        if fold and not self.soft:
            # entry norm+relu deferred into the down1 bridge prologue
            x, aff = self.in_block(x)
            x = self.down1(x, pre=aff)
        else:
            x = self.in_block(x)
            x = self.down1(x)
        x = self.down2(x)
        x = self.down3(x)
        x = self.down4(x)
        x = self.down5(x)
        x = x.reshape(x.shape[0], -1)
        mean = self.fc_mean(x).astype(jnp.float32)
        std = jax.nn.relu(self.fc_std(x).astype(jnp.float32))
        return mean, std

    def decode(self, z: jax.Array, dropout: float = 0.0) -> jax.Array:
        """Latent [B, dim] -> softmax probabilities [B, D, H, W, n_class]
        (joint_model.py:252-266)."""
        from vae_segmentation_tpu.ops import s2d as s2d_ops

        fold = self._s2d() and self.norm_type == 1
        side = round((self.bottleneck // self.fmaps[5]) ** (1.0 / 3.0))
        x = self.fc2(z.astype(self.dtype))
        x = x.reshape(x.shape[0], side, side, side, self.fmaps[5])
        for up in (self.up1, self.up2, self.up3, self.up4):
            x = up(x)
            x = mc_dropout(self, x, dropout)
        x = self.up5(x)
        aff = None
        if fold and not self.soft:
            x, aff = x  # decoder-final norm deferred (up5 defer_affine)
        # f32 softmax math, compute-dtype storage (HBM: 2 GB vs 1 GB at
        # 128^3 batch 4 per probability volume); on the folded stencil
        # path the softmax fuses into the head conv's kernel epilogue
        # (no dropout sits between head conv and softmax here,
        # joint_model.py:265-266). With the MC decoder dropout ACTIVE the
        # deferred norm is applied inline (the affine+relu fuses into the
        # dropout multiply — same pass count as the materialized norm);
        # without dropout it rides into the head kernel's prologue.
        if dropout:
            from vae_segmentation_tpu.models.blocks import apply_affine_relu

            if aff is not None:
                x = apply_affine_relu(x, aff)
                aff = None
            x = mc_dropout(self, x, dropout)
            x = self.out_block(x, softmax_classes=self.n_class)
        else:
            x = self.out_block(x, softmax_classes=self.n_class, pre=aff)
        if fold:
            return x if self.folded_io else s2d_ops.unfold_rep(x,
                                                               self.n_class)
        return x

    def __call__(self, x: jax.Array, if_random: bool = False, scale: float = 1.0,
                 mid_input: bool = False, dropout: float = 0.0):
        """Full forward (joint_model.py:227-272).

        Returns (recon, mean, std) — or just recon when mid_input=True.
        """
        if mid_input:
            return self.decode(x, dropout=dropout)
        mean, std = self.encode(x)
        if if_random:
            z = jax.random.normal(self.make_rng("reparam"), mean.shape,
                                  dtype=jnp.float32)
            latent = mean + z * std * scale
        else:
            latent = mean
        recon = self.decode(latent, dropout=dropout)
        return recon, mean, std
