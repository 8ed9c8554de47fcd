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

    def setup(self):
        f = self.fmaps
        kw = dict(norm_type=self.norm_type, dtype=self.dtype)
        self.in_block = ConvNormAct(f[0], **kw)
        self.down1 = Down(f[1], **kw)
        self.in_block_mask = ConvNormAct(f[0], **kw)
        self.down1_mask = Down(f[1], **kw)
        self.merge = ConvNormAct(f[1], **kw)
        self.down2 = Down(f[2], **kw)
        self.down3 = Down(f[3], **kw)
        self.down4 = Down(f[4], **kw)
        self.up2 = Up(f[3], **kw)
        self.up3 = Up(f[2], **kw)
        self.up4 = Up(f[1], **kw)
        self.up5 = Up(f[0], **kw)
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
