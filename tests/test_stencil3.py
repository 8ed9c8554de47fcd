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


@pytest.mark.parametrize("merged", ["0", "1"])
def test_grouped_folded_parity(rng, merged, monkeypatch):
    """conv3_stencil_folded (grouped-tap path) == XLA conv with the SAME
    expanded kernel, on both the plain-folded and W-PACKED reps, and the
    gradient wrt the RAW weights (through the s2d expansion) matches —
    under both backward implementations (the default dx+dk kernel pair
    and the opt-in merged kernel, VAESEG_MERGED_BWD)."""
    monkeypatch.setenv("VAESEG_MERGED_BWD", merged)
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


def test_pre_fused_parity(rng):
    """conv3_stencil_pre == conv3_stencil(relu(x*s+t)) — the fused
    InstanceNorm+ReLU prologue, forward AND all five gradients."""
    from vae_segmentation_tpu.ops.pallas.stencil3 import conv3_stencil_pre

    bsz, cin, cout = 2, 8, 8
    x = jnp.asarray(rng.normal(size=(bsz, 4, 4, 8, cin)), jnp.float32)
    s = jnp.asarray(1.0 + 0.3 * rng.normal(size=(bsz, cin)), jnp.float32)
    t = jnp.asarray(0.3 * rng.normal(size=(bsz, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(bsz, 4, 4, 8, cout)), jnp.float32)

    def f_fused(x, s, t, k, b):
        return jnp.mean(jnp.square(conv3_stencil_pre(x, s, t, k, b) - tgt))

    def f_ref(x, s, t, k, b):
        xn = jnp.maximum(x * s[:, None, None, None, :]
                         + t[:, None, None, None, :], 0.0)
        return jnp.mean(jnp.square(conv3_stencil(xn, k, b) - tgt))

    np.testing.assert_allclose(
        float(f_fused(x, s, t, k, b)), float(f_ref(x, s, t, k, b)),
        rtol=1e-5)
    g_f = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, s, t, k, b)
    g_r = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, s, t, k, b)
    for name, gf, gr in zip("xstkb", g_f, g_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("merged", ["0", "1"])
def test_pre_fused_folded_parity(rng, merged, monkeypatch):
    """conv3_stencil_folded_pre (grouped-tap + prologue) == unfused
    norm-affine + conv3_stencil_folded, on plain-folded and W-PACKED reps,
    forward and gradients — under both backward implementations
    (VAESEG_MERGED_BWD)."""
    monkeypatch.setenv("VAESEG_MERGED_BWD", merged)
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.stencil3 import (
        conv3_stencil_folded, conv3_stencil_folded_pre)

    for wpack in (False, True):
        c_in, c_out = (8, 8) if wpack else (16, 16)
        pack = s2d.NB * (s2d.WPACK if wpack else 1)
        x = jnp.asarray(rng.normal(size=(1, 4, 8, 32, c_in)), jnp.float32)
        xf = s2d.fold_rep(x, wpack)
        cin_f = xf.shape[-1]
        s = jnp.asarray(1.0 + 0.3 * rng.normal(size=(1, cin_f)), jnp.float32)
        t = jnp.asarray(0.3 * rng.normal(size=(1, cin_f)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 3, c_in, c_out)) * 0.3,
                        jnp.float32)
        b = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32)
        bias_f = jnp.tile(b, pack)
        ke = s2d.expand_kernel3_fast(k)
        if wpack:
            ke = s2d.expand_kernel_w(ke)
        tgt = jnp.asarray(rng.normal(size=xf.shape[:-1] + (pack * c_out,)),
                          jnp.float32)

        def f_fused(xf, s, t, kk):
            y = conv3_stencil_folded_pre(xf, s, t, kk, bias_f, wpack)
            return jnp.mean(jnp.square(y - tgt))

        def f_ref(xf, s, t, kk):
            xn = jnp.maximum(xf * s[:, None, None, None, :]
                             + t[:, None, None, None, :], 0.0)
            y = conv3_stencil_folded(xn, kk, bias_f, wpack)
            return jnp.mean(jnp.square(y - tgt))

        np.testing.assert_allclose(
            float(f_fused(xf, s, t, ke)), float(f_ref(xf, s, t, ke)),
            rtol=1e-5, err_msg=f"wpack={wpack}")
        g_f = jax.grad(f_fused, argnums=(0, 1, 2, 3))(xf, s, t, ke)
        g_r = jax.grad(f_ref, argnums=(0, 1, 2, 3))(xf, s, t, ke)
        for name, gf, gr in zip(("x", "s", "t", "k"), g_f, g_r):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-5,
                err_msg=f"wpack={wpack} {name}")


def _assert_grads_match(g1, g0):
    for (p1, l1), (_, l0) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g0)[0]):
        key = jax.tree_util.keystr(p1)
        if "bias" in key and ("DoubleConv" in key or "in_block" in key):
            # norm-cancelled bias (conv output feeds InstanceNorm
            # directly): a constant channel offset is a no-op through the
            # norm, so this gradient is analytically zero - both paths
            # emit fp roundoff noise; only bound it (same treatment as
            # tests/test_train_parity.py)
            assert float(np.max(np.abs(np.asarray(l1)))) < 1e-3, key
            continue
        a, b = np.asarray(l1, np.float64), np.asarray(l0, np.float64)
        # norm-based: the two paths compute the same math with different
        # f32 summation orders; individual near-zero elements can drift
        # relatively far while the gradient as a vector is unchanged
        rel_l2 = (np.linalg.norm((a - b).ravel())
                  / (np.linalg.norm(b.ravel()) + 1e-12))
        assert rel_l2 < 2e-4, (str(p1), rel_l2)
        assert np.max(np.abs(a - b)) < 1e-4 * (np.max(np.abs(b)) + 1.0), \
            str(p1)


def test_model_fused_prologue_parity(rng, monkeypatch):
    """Folded SegUNet forward + gradient with the fused norm+relu prologue
    (VAESEG_FUSE=1, the default) equals the unfused stencil path
    (VAESEG_FUSE=0). f32 compute -> tight tolerance."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    monkeypatch.setenv("VAESEG_STENCIL", "1")
    from vae_segmentation_tpu.models import SegUNet

    img = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    model = SegUNet(n_class=2, fmaps=(2, 3, 4, 5, 6, 8), dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img)["params"]

    def run(fuse):
        monkeypatch.setenv("VAESEG_FUSE", fuse)
        out = model.apply({"params": params}, img)
        g = jax.grad(lambda p: jnp.sum(
            model.apply({"params": p}, img) ** 2))(params)
        return np.asarray(out), g

    o1, g1 = run("1")
    o0, g0 = run("0")
    np.testing.assert_allclose(o1, o0, rtol=1e-5, atol=1e-6)
    _assert_grads_match(g1, g0)


def test_stats_epilogue_forward_and_grad(rng):
    """stats=True returns the output's per-batch (sum, sumsq) alongside an
    unchanged y, and gradients through the stats outputs match computing
    the same reductions in XLA from y."""
    from vae_segmentation_tpu.ops.pallas.stencil3 import (
        conv3_stencil_folded, conv3_stencil_pre)

    B, C, O = 2, 32, 16
    x = jnp.asarray(rng.normal(size=(B, 4, 4, 8, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, C, O)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(O,)), jnp.float32)

    y0 = conv3_stencil(x, k, b)
    y1, st = conv3_stencil(x, k, b, False, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(st[:, 0]),
                               np.asarray(jnp.sum(y0, axis=(1, 2, 3))),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st[:, 1]),
                               np.asarray(jnp.sum(y0 * y0, axis=(1, 2, 3))),
                               rtol=1e-5, atol=1e-4)

    def f_stats(x, k, b):
        y, st = conv3_stencil(x, k, b, False, True)
        return (jnp.sum(y * 0.3) + jnp.sum(st[:, 0] * 1.7)
                + jnp.sum(st[:, 1] * 0.11))

    def f_ref(x, k, b):
        y = conv3_stencil(x, k, b)
        return (jnp.sum(y * 0.3)
                + jnp.sum(jnp.sum(y, axis=(1, 2, 3)) * 1.7)
                + jnp.sum(jnp.sum(y * y, axis=(1, 2, 3)) * 0.11))

    g1 = jax.grad(f_stats, argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, k, b)
    for name, a, c in zip("xkb", g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    # grouped + pre variants: stats equal XLA reductions of y
    from vae_segmentation_tpu.ops import s2d

    kf = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)) * 0.3, jnp.float32)
    ke = s2d.expand_kernel3_fast(kf)
    xf = jnp.asarray(rng.normal(size=(B, 4, 4, 8, 16)), jnp.float32)
    bf = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    y0 = conv3_stencil_folded(xf, ke, bf, False)
    y1, st = conv3_stencil_folded(xf, ke, bf, False, False, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(st[:, 0]),
                               np.asarray(jnp.sum(y0, axis=(1, 2, 3))),
                               rtol=1e-5, atol=1e-4)

    s_ = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    t_ = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    y0 = conv3_stencil_pre(x, s_, t_, k, b)
    y1, st = conv3_stencil_pre(x, s_, t_, k, b, None, True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(np.asarray(st[:, 1]),
                               np.asarray(jnp.sum(y0 * y0, axis=(1, 2, 3))),
                               rtol=1e-5, atol=1e-4)


def test_model_stats_affine_parity(rng, monkeypatch):
    """Folded SegUNet with the stencil path (stats-epilogue affines) equals
    the plain XLA folded path, forward and gradient (f32 compute)."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    from vae_segmentation_tpu.models import SegUNet

    img = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 1)), jnp.float32)
    model = SegUNet(n_class=2, fmaps=(2, 3, 4, 5, 6, 8), dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, img)["params"]

    def run(stencil):
        monkeypatch.setenv("VAESEG_STENCIL", stencil)
        out = model.apply({"params": params}, img)
        g = jax.grad(lambda p: jnp.sum(
            model.apply({"params": p}, img) ** 2))(params)
        return np.asarray(out), g

    o1, g1 = run("1")
    o0, g0 = run("0")
    np.testing.assert_allclose(o1, o0, rtol=1e-5, atol=1e-6)
    _assert_grads_match(g1, g0)
