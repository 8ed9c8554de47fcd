"""Shape/image encoder (reference `Encoder`, joint_model.py:274-305).

Same conv trunk as the VAE encoder, then fc 16384 -> 1024 -> 128 -> dim with
a sigmoid output. Used as a shape discriminator (dim=1) for
`discriminator_train` / `domain_adaptation_dis` (main_target.py:319,340) and as
an image encoder (dim=128) for `embed_train` (main_source.py:261).
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


class ShapeEncoder(nn.Module):
    """[B, D, H, W, n_channels] -> sigmoid embedding [B, dim]."""

    dim: int = 1
    norm_type: int = 1
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dtype: Any = jnp.bfloat16
    bottleneck: int = 16384

    remat: bool = True

    def setup(self):
        f = self.fmaps
        CNA = remat_stage(ConvNormAct, self.remat)
        RDown = remat_stage(Down, self.remat)
        kw = dict(norm_type=self.norm_type, dtype=self.dtype)
        self.in_block = CNA(f[0], **kw)
        self.down1 = RDown(f[1], **kw)
        self.down2 = RDown(f[2], **kw)
        self.down3 = RDown(f[3], **kw)
        self.down4 = RDown(f[4], **kw)
        self.down5 = RDown(f[5], **kw)
        self.fc1 = _dense(1024, self.bottleneck, self.dtype)
        self.fc2 = _dense(128, 1024, self.dtype)
        self.fc_mean = _dense(self.dim, 128, self.dtype)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.in_block(x)
        x = self.down1(x)
        x = self.down2(x)
        x = self.down3(x)
        x = self.down4(x)
        x = self.down5(x)
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(self.fc1(x))
        x = jax.nn.relu(self.fc2(x))
        return jax.nn.sigmoid(self.fc_mean(x).astype(jnp.float32))
