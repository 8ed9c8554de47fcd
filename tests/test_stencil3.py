"""Parity of the production Pallas stencil conv (ops/pallas/stencil3.py)
against lax.conv_general_dilated, forward and backward (interpret mode on
CPU; the same kernel compiles on TPU via Mosaic). Shapes mirror the folded
trunk stages (C multiples of lane-friendly sizes, W % 8 == 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.ops.pallas.stencil3 import conv3_stencil


def _xla_conv(x, k, b, relu=False):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b.astype(x.dtype)
    return jnp.maximum(y, 0) if relu else y


@pytest.mark.parametrize("shape,cout", [
    ((2, 6, 8, 8, 16), 16),   # folded-stage-like
    ((1, 5, 8, 16, 8), 24),   # rectangular, cin != cout
])
def test_forward_parity(rng, shape, cout):
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = conv3_stencil(x, k, b)
    want = _xla_conv(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_forward_relu_parity(rng):
    shape, cout = (2, 4, 8, 8, 8), 8
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3_stencil(x, k, b, True)),
        np.asarray(_xla_conv(x, k, b, relu=True)), rtol=2e-4, atol=2e-4)


def test_grad_parity(rng):
    shape, cout = (2, 5, 8, 8, 8), 8
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=shape[:-1] + (cout,)), jnp.float32)

    def loss_pal(x, k, b):
        return jnp.mean(jnp.square(conv3_stencil(x, k, b) - tgt))

    def loss_xla(x, k, b):
        return jnp.mean(jnp.square(_xla_conv(x, k, b) - tgt))

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(x, k, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, k, b)
    for a, b_, name in zip(gp, gx, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_bf16_path(rng):
    """bf16 activations + bf16 expanded weights (the production dtype mix)
    agree with the bf16 XLA conv to bf16 tolerance."""
    shape, cout = (1, 4, 8, 8, 16), 16
    x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 16, cout)) * 0.2, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = np.asarray(conv3_stencil(x, k, b).astype(jnp.float32))
    want = np.asarray(_xla_conv(x, k, b).astype(jnp.float32))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
