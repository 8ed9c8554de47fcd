"""Two-branch fusion U-Net (reference `Fusion`, joint_model.py:392-436).

Separate image and mask input branches merged by addition at the stride-2
feature scale (joint_model.py:420-425), then a shared U-Net body with the same
two skip-adds as SegUNet. Used only by the `Embed` composite
(joint_model.py:469-501).
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
)


class FusionNet(nn.Module):
    """(image [B,D,H,W,Ci], mask [B,D,H,W,Cm]) -> probabilities [B,D,H,W,n_class]."""

    n_class: int = 2
    norm_type: int = 1
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dtype: Any = jnp.bfloat16

    remat: bool = True

    def setup(self):
        f = self.fmaps
        CNA = remat_stage(ConvNormAct, self.remat)
        RDown = remat_stage(Down, self.remat)
        RUp = remat_stage(Up, self.remat)
        kw = dict(norm_type=self.norm_type, dtype=self.dtype)
        self.in_block = CNA(f[0], **kw)
        self.down1 = RDown(f[1], **kw)
        self.in_block_mask = CNA(f[0], **kw)
        self.down1_mask = RDown(f[1], **kw)
        self.merge = CNA(f[1], **kw)
        self.down2 = RDown(f[2], **kw)
        self.down3 = RDown(f[3], **kw)
        self.down4 = RDown(f[4], **kw)
        self.up2 = RUp(f[3], **kw)
        self.up3 = RUp(f[2], **kw)
        self.up4 = RUp(f[1], **kw)
        self.up5 = RUp(f[0], **kw)
        self.out_block = OutConv(self.n_class, dtype=self.dtype)

    def __call__(self, image: jax.Array, mask: jax.Array) -> jax.Array:
        x1_img = self.in_block(image)
        x1_mask = self.in_block_mask(mask)
        x2 = self.down1(x1_img) + self.down1_mask(x1_mask)
        x2 = self.merge(x2)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        h = self.up2(x5)
        h = self.up3(h) + x3.astype(self.dtype)
        h = self.up4(h) + x2.astype(self.dtype)
        h = self.up5(h)
        h = self.out_block(h)
        return jax.nn.softmax(h.astype(jnp.float32), axis=-1)
