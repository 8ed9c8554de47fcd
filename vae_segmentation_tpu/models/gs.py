"""Group-sum ("GS") conv variants and the multi-scale GS segmentation head
(reference joint_model.py:17-33,54-99,140-202,307-346 — research variants,
unused by the shipped recipes but part of the model-zoo surface).

TPU-first notes: weight reparameterizations (abs-normalize for GSConv,
mean-centering for SConv) are traced functions of the fp32 params — XLA
constant-folds them per step and the conv itself still hits the MXU in the
compute dtype. Channels-last layout throughout; the channel-group axis math
of GSNorm/GSConv operates on the trailing axis.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_segmentation_tpu.models.blocks import (
    DEFAULT_FMAPS,
    Conv3,
    gs_norm,
    torch_bias_init,
    torch_uniform_init,
)

Dtype = Any


def _gs_normalize_kernel(kernel: jax.Array, num_group: int) -> jax.Array:
    """|w| normalized to sum 1 over each input-channel group
    (joint_model.py:153-159). kernel: [kd, kh, kw, I, O]."""
    k = jnp.abs(kernel)
    kd, kh, kw, i, o = k.shape
    grouped = k.reshape(kd, kh, kw, num_group, i // num_group, o)
    denom = jnp.sum(grouped, axis=4, keepdims=True)
    return (grouped / denom).reshape(k.shape)


class GSConv3d(nn.Module):
    """Conv whose weights are abs-normalized per input-channel group
    (joint_model.py:140-161)."""

    features: int
    num_group: int = 1
    kernel: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (*self.kernel, in_ch, self.features)
        kernel = self.param("kernel", torch_uniform_init("conv"), kshape,
                            jnp.float32)
        kernel = _gs_normalize_kernel(kernel, self.num_group)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            fan_in = math.prod(self.kernel) * in_ch
            bias = self.param("bias", torch_bias_init(fan_in),
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class GSConvTranspose3d(nn.Module):
    """Transposed conv with the same group-abs-normalized weights
    (joint_model.py:164-185)."""

    features: int
    num_group: int = 1
    kernel: Sequence[int] = (2, 2, 2)
    strides: Sequence[int] = (2, 2, 2)
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (*self.kernel, in_ch, self.features)
        kernel = self.param("kernel", torch_uniform_init("transpose"), kshape,
                            jnp.float32)
        kernel = _gs_normalize_kernel(kernel, self.num_group)
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            strides=tuple(self.strides), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(8 * in_ch),
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SConv3d(nn.Module):
    """Conv with spatially mean-centered weights (joint_model.py:186-202)."""

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = (*self.kernel, in_ch, self.features)
        kernel = self.param("kernel", torch_uniform_init("conv"), kshape,
                            jnp.float32)
        kernel = kernel - jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        fan_in = math.prod(self.kernel) * in_ch
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,),
                          jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias.astype(self.dtype)


def _act(soft: bool):
    return jax.nn.softplus if soft else jax.nn.relu


class ConvGS(nn.Module):
    """conv + act (no norm) (joint_model.py:90-99)."""

    features: int
    soft: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return _act(self.soft)(Conv3(self.features, dtype=self.dtype)(x))


class DoubleConvGS(nn.Module):
    """2x (conv + act) (joint_model.py:54-66; the GS family really is a
    double conv, unlike the norm_type family's triple)."""

    features: int
    soft: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = _act(self.soft)(Conv3(self.features, dtype=self.dtype)(x))
        return x


class DownGS(nn.Module):
    """Strided 2^3 conv then DoubleConvGS (joint_model.py:78-88)."""

    features: int
    soft: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = Conv3(x.shape[-1], kernel=(2, 2, 2), strides=(2, 2, 2),
                  padding="VALID", dtype=self.dtype)(x)
        return DoubleConvGS(self.features, self.soft, dtype=self.dtype)(x)


class UpGS(nn.Module):
    """Trilinear 2x upsample then DoubleConvGS (joint_model.py:67-77)."""

    features: int
    soft: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * d, 2 * h, 2 * w, c), "trilinear")
        return DoubleConvGS(self.features, self.soft, dtype=self.dtype)(x)


def _upsample(x, factor: int):
    b, d, h, w, c = x.shape
    return jax.image.resize(
        x, (b, factor * d, factor * h, factor * w, c), "trilinear")


class SegmentationGS(nn.Module):
    """HED-style multi-scale segmentation head (joint_model.py:307-346):
    4 encoder scales, each GS-normalized and upsampled to full resolution,
    concatenated, fused by a 3^3 conv + 1^3 conv head."""

    n_class: int = 2
    fmaps: Sequence[int] = DEFAULT_FMAPS
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        f = self.fmaps
        x1 = ConvGS(f[0], dtype=self.dtype)(x)
        x2 = DownGS(f[1], dtype=self.dtype)(x1)
        x3 = DownGS(f[2], dtype=self.dtype)(x2)
        x4 = DownGS(f[3], dtype=self.dtype)(x3)
        # reference groups 2/4/8/8 at fmaps (8,16,32,64); clamp to a divisor
        # so reduced-fmap configs stay valid
        def g(v, want):
            return gs_norm(v, math.gcd(want, v.shape[-1]))

        feats = jnp.concatenate([
            g(x1, 2),
            _upsample(g(x2, 4), 2),
            _upsample(g(x3, 8), 4),
            _upsample(g(x4, 8), 8),
        ], axis=-1)
        h = ConvGS(32, dtype=self.dtype)(feats)
        h = Conv3(self.n_class, kernel=(1, 1, 1), dtype=self.dtype)(h)
        return jax.nn.softmax(h.astype(jnp.float32), axis=-1) \
            .astype(self.dtype)
