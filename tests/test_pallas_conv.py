"""Parity of the Pallas lane-packed 3^3 conv (ops/pallas/conv3.py) against
lax.conv_general_dilated, forward and backward, in interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.ops.pallas.conv3 import conv3_pallas


def _ref_conv(x, k, b, relu):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
    return jnp.maximum(y, 0.0) if relu else y


# W*C must be a multiple of 128: use W=64 with C in {2, 8}
@pytest.mark.parametrize("cin,cout", [(2, 2), (8, 8), (2, 8), (8, 2)])
@pytest.mark.parametrize("relu", [False, True])
def test_conv3_forward_parity(rng, cin, cout, relu):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 64, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = conv3_pallas(x, k, b, relu)
    want = _ref_conv(x, k, b, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_conv3_grad_parity(rng):
    cin, cout = 8, 8
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 16 * 8, cin))[:, :, :, :64],
                    jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 64, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(1, 4, 8, 64, cout)), jnp.float32)

    def loss_pallas(x, k, b):
        return jnp.sum((conv3_pallas(x, k, b, True) - t) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum((_ref_conv(x, k, b, True) - t) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, w in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=2e-3, atol=2e-3)


def test_conv3_bf16_io(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 64, 2)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)) * 0.2, jnp.float32)
    b = jnp.zeros((2,), jnp.float32)
    got = conv3_pallas(x, k, b, False)
    assert got.dtype == jnp.bfloat16
    want = _ref_conv(x.astype(jnp.float32), k, b, False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)
