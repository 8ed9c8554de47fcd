"""Segmentation U-Net (reference `Segmentation`, joint_model.py:349-390).

5-stage encoder (8->128 ch, 128^3 -> 8^3), 4-stage decoder with skip-ADDS at
exactly two scales (x += x3 after up3, x += x2 after up4;
joint_model.py:380-382), conv head + softmax. Optional MC dropout after each
decoder stage AND after the head conv, before the softmax
(joint_model.py:379-387).

The reference's dict-in/dict-out convention (forward(data_dict, in_key,
out_key)) lives one level up, in models/joint.py — the module itself is a pure
array -> array function, which is what jit wants.
"""

from __future__ import annotations

from typing import Any, Sequence

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
)


class SegUNet(nn.Module):
    """[B, D, H, W, n_channels] image -> [B, D, H, W, n_class] probabilities."""

    n_class: int = 2
    norm_type: int = 1
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dtype: Any = jnp.bfloat16

    remat: bool = True
    # space-to-depth for the lane-starved stages (ops/s2d.py): exact same
    # math and SAME param tree; None -> models.blocks.use_s2d() default
    s2d: Any = None
    # return space-to-depth probabilities [B, D/2, H/2, W/2, 8*n_class]
    # instead of unfolding (the Joint handoff keeps everything folded,
    # skipping three full-resolution reorgs per step)
    folded_out: bool = False

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
        kw = dict(norm_type=self.norm_type, dtype=self.dtype)
        self.in_block = CNA(f[0], fold_input=fold, wpack=wp,
                            defer_affine=fold, **kw)
        self.down1 = RDown(f[1], folded_in=fold, folded_out=fold,
                           wpack_in=wp, **kw)
        # the 32^3-logical stage folds too (16^3 x 8*f[2] lanes): unfolded
        # it runs C=32 convs at ~10% MXU utilization (round-3 trace)
        self.down2 = RDown(f[2], folded_in=fold, folded_out=fold, **kw)
        self.down3 = RDown(f[3], folded_in=fold, **kw)
        self.down4 = RDown(f[4], **kw)
        self.up2 = RUp(f[3], **kw)
        self.up3 = RUp(f[2], folded_out=fold, **kw)
        self.up4 = RUp(f[1], folded_in=fold, folded_out=fold, **kw)
        # the decoder-final norm+relu defers into the head conv's kernel
        # prologue (or is applied inline when head dropout is active)
        self.up5 = RUp(f[0], folded_in=fold, folded_out=fold,
                       wpack_out=wp, defer_affine=fold, **kw)
        self.out_block = OutConv(self.n_class, dtype=self.dtype, folded=fold,
                                 wpack=wp)

    def __call__(self, x: jax.Array, dropout: float = 0.0) -> jax.Array:
        from vae_segmentation_tpu.ops import s2d as s2d_ops

        fold = self._s2d() and self.norm_type == 1

        def drop(h):
            return mc_dropout(self, h, dropout)

        if fold:
            # the entry stage's final norm+relu defers into the down1
            # bridge prologue: the normalized full-res tensor never
            # materializes (blocks.ConvNormAct defer_affine)
            x1, aff1 = self.in_block(x)
            x2 = self.down1(x1, pre=aff1)
        else:
            x1 = self.in_block(x)  # fold fused into the entry conv
            x2 = self.down1(x1)    # folded rep at half res when fold
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        h = drop(self.up2(x5))
        h = drop(self.up3(h) + x3.astype(self.dtype))
        h = drop(self.up4(h) + x2.astype(self.dtype))
        h = self.up5(h)
        aff5 = None
        if fold:
            h, aff5 = h  # decoder-final norm deferred (up5 defer_affine)
        # softmax math in f32, output stored in the compute dtype: a full-res
        # f32 probability volume is 2 GB at 128^3 batch 4 (HBM-decisive).
        # With the head dropout inactive (the flagship default) the softmax
        # fuses into the out_block conv's kernel epilogue — and the deferred
        # up5-final norm+relu rides in as the same kernel's prologue; an
        # active head dropout must sit BETWEEN conv and softmax
        # (joint_model.py:386-387) so that path applies the affine inline
        # and keeps the separate softmax.
        if not dropout:
            h = self.out_block(h, softmax_classes=self.n_class, pre=aff5)
        else:
            from vae_segmentation_tpu.models.blocks import apply_affine_relu

            if fold:
                h = apply_affine_relu(h, aff5)
            h = drop(h)
            h = drop(self.out_block(h))
            if fold:
                h = s2d_ops.softmax_folded(h, self.n_class) \
                    .astype(self.dtype)
            else:
                h = jax.nn.softmax(h.astype(jnp.float32), axis=-1) \
                    .astype(self.dtype)
        if fold:
            return h if self.folded_out else s2d_ops.unfold_rep(h,
                                                                self.n_class)
        return h
