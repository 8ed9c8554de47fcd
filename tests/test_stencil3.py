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


def test_grouped_folded_parity(rng):
    """conv3_stencil_folded (grouped-tap path) == XLA conv with the SAME
    expanded kernel, on both the plain-folded and W-PACKED reps, and the
    gradient wrt the RAW weights (through the s2d expansion) matches."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.stencil3 import conv3_stencil_folded

    for wpack in (False, True):
        c_in, c_out = 16, 16   # folded 128 (or wpacked would need c=8)
        if wpack:
            c_in, c_out = 8, 8
        x = jnp.asarray(rng.normal(size=(1, 4, 8, 32, c_in)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, c_in, c_out)) * 0.3,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32)
        xf = s2d.fold_rep(x, wpack)
        bias_f = jnp.tile(b, s2d.NB * (s2d.WPACK if wpack else 1))

        def expand(kk):
            ke = s2d.expand_kernel3_fast(kk)
            return s2d.expand_kernel_w(ke) if wpack else ke

        def f_pal(kk):
            y = conv3_stencil_folded(xf, expand(kk), bias_f, wpack)
            return s2d.unfold_rep(y, c_out)

        def f_xla(kk):
            y = jax.lax.conv_general_dilated(
                xf, expand(kk), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias_f
            return s2d.unfold_rep(y, c_out)

        got, want = f_pal(k), f_xla(k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"wpack={wpack} fwd")
        # and both must equal the plain unfolded conv (fold exactness)
        plain = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
        np.testing.assert_allclose(np.asarray(got), np.asarray(plain),
                                   rtol=3e-4, atol=3e-4)

        tgt = jnp.asarray(rng.normal(size=plain.shape), jnp.float32)
        gp = jax.grad(lambda kk: jnp.mean(jnp.square(f_pal(kk) - tgt)))(k)
        gx = jax.grad(lambda kk: jnp.mean(jnp.square(f_xla(kk) - tgt)))(k)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"wpack={wpack} dk")
        gxp = jax.grad(lambda xx: jnp.mean(jnp.square(
            s2d.unfold_rep(conv3_stencil_folded(
                s2d.fold_rep(xx, wpack), expand(k), bias_f, wpack), c_out)
            - tgt)))(x)
        gxx = jax.grad(lambda xx: jnp.mean(jnp.square(
            jax.lax.conv_general_dilated(
                xx, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + b
            - tgt)))(x)
        np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxx),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"wpack={wpack} dx")
