"""Numerical parity of the Pallas fused kernels (interpret mode on CPU)
against plain-XLA reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.models.blocks import instance_norm
from vae_segmentation_tpu.ops.pallas import instance_norm_act, reparam_kl
from vae_segmentation_tpu.ops import losses as L


def _ref_norm_relu(x, relu=True):
    y = instance_norm(x.astype(jnp.float32))
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("c", [8, 16, 128])
@pytest.mark.parametrize("spatial", [(8, 8, 8), (6, 10, 4)])
def test_instance_norm_act_forward(rng, c, spatial):
    x = jnp.asarray(rng.normal(size=(2, *spatial, c)) * 3 + 1,
                    dtype=jnp.float32)
    got = instance_norm_act(x, True)
    want = _ref_norm_relu(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_instance_norm_act_no_relu(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)), dtype=jnp.float32)
    got = instance_norm_act(x, False)
    want = _ref_norm_relu(x, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_instance_norm_act_bf16_io(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 16)), dtype=jnp.bfloat16)
    got = instance_norm_act(x, True)
    assert got.dtype == jnp.bfloat16
    want = _ref_norm_relu(x).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("c", [8, 128])
def test_instance_norm_act_grad(rng, c):
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, c)), dtype=jnp.float32)

    def f_pallas(x):
        return jnp.sum(instance_norm_act(x, True) ** 2)

    def f_ref(x):
        return jnp.sum(_ref_norm_relu(x) ** 2)

    g_pallas = jax.grad(f_pallas)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_reparam_kl_stats_and_grads(rng):
    b, d = 4, 128
    mean = jnp.asarray(rng.normal(size=(b, d)), dtype=jnp.float32)
    std = jnp.asarray(np.abs(rng.normal(size=(b, d))), dtype=jnp.float32)

    (latent, kl) = reparam_kl(mean, std, jnp.float32(0.35), 7)
    # KL matches the reference formula exactly
    np.testing.assert_allclose(float(kl), float(L.kl_loss(mean, std)),
                               rtol=1e-5)
    # latent = mean + eps*std*scale with eps ~ N(0,1): check moments of the
    # recovered eps
    eps = (np.asarray(latent) - np.asarray(mean)) / (np.asarray(std) * 0.35 + 1e-12)
    assert abs(eps.mean()) < 0.15
    assert abs(eps.std() - 1.0) < 0.15

    # analytic gradients vs autodiff of an XLA reference with the SAME eps
    def ref(mean, std, scale):
        lat = mean + jnp.asarray(eps) * std * scale
        return jnp.sum(lat * 1.5) + 2.0 * L.kl_loss(mean, std)

    def fused(mean, std, scale):
        lat, klv = reparam_kl(mean, std, scale, 7)
        return jnp.sum(lat * 1.5) + 2.0 * klv

    g_ref = jax.grad(ref, argnums=(0, 1))(mean, std, jnp.float32(0.35))
    g_fused = jax.grad(fused, argnums=(0, 1))(mean, std, jnp.float32(0.35))
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_blocks_route_through_pallas_identically(rng, monkeypatch):
    """DoubleConv output must be identical whether the norm+relu pair runs
    through the fused Pallas kernel or the XLA fallback."""
    from vae_segmentation_tpu.models.blocks import DoubleConv

    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 4)), dtype=jnp.float32)
    block = DoubleConv(features=8, dtype=jnp.float32)
    params = block.init({"params": jax.random.PRNGKey(0)}, x)

    monkeypatch.setenv("VAESEG_PALLAS", "0")
    want = block.apply(params, x)
    monkeypatch.setenv("VAESEG_PALLAS", "1")
    got = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_reparam_kl_deterministic_per_seed(rng):
    mean = jnp.zeros((2, 128), jnp.float32)
    std = jnp.ones((2, 128), jnp.float32)
    l1, _ = reparam_kl(mean, std, jnp.float32(1.0), 3)
    l2, _ = reparam_kl(mean, std, jnp.float32(1.0), 3)
    l3, _ = reparam_kl(mean, std, jnp.float32(1.0), 4)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.allclose(np.asarray(l1), np.asarray(l3))


# ---------------------------------------------------------------------------
# fused multi-target dice sums (ops/pallas/dicesums.py)
# ---------------------------------------------------------------------------

def _dice_oracle(pred, targets, n_class, eps):
    out = []
    for t in targets:
        out.append(L.soft_dice_per_class(
            pred.reshape(*pred.shape[:4], -1, n_class),
            t.reshape(*t.shape[:4], -1, n_class), eps))
    return out


@pytest.mark.parametrize("k", [1, 3])
def test_multi_soft_dice_forward(rng, k):
    from vae_segmentation_tpu.ops.pallas.dicesums import multi_soft_dice

    n = 2
    pred = jnp.asarray(rng.random((2, 8, 8, 8, 16 * n)), jnp.bfloat16)
    targets = [jnp.asarray(rng.random((2, 8, 8, 8, 16 * n)) > 0.5,
                           jnp.bfloat16) for _ in range(k)]
    got = multi_soft_dice(pred, targets, n, eps=L.EVAL_EPS)
    want = _dice_oracle(pred, targets, n, L.EVAL_EPS)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=2e-3)


def test_multi_soft_dice_grad(rng):
    from vae_segmentation_tpu.ops.pallas.dicesums import multi_soft_dice

    n = 2
    pred = jnp.asarray(rng.random((1, 4, 8, 8, 8 * n)), jnp.float32)
    rec = jnp.asarray(rng.random((1, 4, 8, 8, 8 * n)), jnp.float32)
    oh = jnp.asarray(rng.random((1, 4, 8, 8, 8 * n)) > 0.5, jnp.float32)

    def fused(p, r):
        d_pr, d_po = multi_soft_dice(p, (r, oh), n, eps=L.EVAL_EPS)
        return (1.0 - jnp.mean(d_pr[:, 1:])) + (1.0 - jnp.mean(d_po[:, 1:]))

    def plain(p, r):
        d_pr, d_po = _dice_oracle(p, (r, oh), n, L.EVAL_EPS)
        return (1.0 - jnp.mean(d_pr[:, 1:])) + (1.0 - jnp.mean(d_po[:, 1:]))

    (v_f, (gp_f, gr_f)) = jax.value_and_grad(fused, argnums=(0, 1))(pred, rec)
    (v_p, (gp_p, gr_p)) = jax.value_and_grad(plain, argnums=(0, 1))(pred, rec)
    assert abs(float(v_f) - float(v_p)) < 1e-5
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_p),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_p),
                               rtol=1e-4, atol=1e-6)


def test_up_bridge_w_exact(rng):
    """ops/pallas/upbridge.py vs the XLA folded-space ConvTranspose bridge
    (s2d.expand_up_fold_kernel_w): forward and gradients."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.upbridge import up_bridge_w

    c, o = 4, 4
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 8 * c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)

    def xla(xv, kv, bv):
        y = jax.lax.conv_transpose(
            xv, s2d.expand_up_fold_kernel_w(kv), strides=(2, 2, 1),
            padding="VALID", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + jnp.tile(bv, s2d.NB * s2d.WPACK)

    def pallas(xv, kv, bv):
        k1 = s2d.expand_up_kernel(kv).reshape(c, 8 * o)
        return up_bridge_w(xv, k1, jnp.tile(bv, s2d.NB * s2d.WPACK))

    want = xla(x, k, b)
    got = pallas(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    gw = jax.grad(loss(xla), argnums=(0, 1, 2))(x, k, b)
    gg = jax.grad(loss(pallas), argnums=(0, 1, 2))(x, k, b)
    for a, bb, name in zip(gg, gw, "xkb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_up_block_routes_through_bridge_identically(rng, monkeypatch):
    """Up(folded_in, folded_out, wpack_out) with the Pallas bridge forced
    on (interpret mode) equals the XLA folded ConvTranspose route."""
    from vae_segmentation_tpu.models.blocks import Up

    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 32)), jnp.float32)
    mod = Up(4, dtype=jnp.float32, folded_in=True, folded_out=True,
             wpack_out=True)
    monkeypatch.setenv("VAESEG_STENCIL", "0")
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    want = mod.apply({"params": params}, x)
    monkeypatch.setenv("VAESEG_STENCIL", "1")
    got = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_down_bridge_w_exact(rng):
    """down_bridge_w vs the XLA folded-space stride-2 conv
    (s2d.expand_down_fold_kernel_w): forward, gradients, stats."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.upbridge import down_bridge_w

    c, o = 4, 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4, 16 * c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)

    def xla(xv, kv, bv):
        y = jax.lax.conv_general_dilated(
            xv, s2d.expand_down_fold_kernel_w(kv), (2, 2, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + jnp.tile(bv, s2d.NB)

    want = xla(x, k, b)
    got = down_bridge_w(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    got_s, st = down_bridge_w(x, k, b, True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(jnp.sum(want, axis=(1, 2, 3))),
        rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st[:, 1]),
        np.asarray(jnp.sum(want.astype(jnp.float32) ** 2, axis=(1, 2, 3))),
        rtol=1e-5, atol=1e-4)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    gw = jax.grad(loss(xla), argnums=(0, 1, 2))(x, k, b)
    gg = jax.grad(loss(down_bridge_w), argnums=(0, 1, 2))(x, k, b)
    for a, bb, name in zip(gg, gw, "xkb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5, err_msg=name)

    # stats path gradient: the (sum, sumsq) outputs backpropagate too
    def loss_stats(xv, kv, bv):
        y, st = down_bridge_w(xv, kv, bv, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(st[:, 0] * 0.3) \
            + jnp.sum(st[:, 1] * 0.01)

    def loss_stats_ref(xv, kv, bv):
        y = xla(xv, kv, bv)
        return (jnp.sum(jnp.sin(y))
                + jnp.sum(jnp.sum(y, axis=(1, 2, 3)) * 0.3)
                + jnp.sum(jnp.sum(y.astype(jnp.float32) ** 2,
                                  axis=(1, 2, 3)) * 0.01))

    gw = jax.grad(loss_stats_ref, argnums=(0, 1, 2))(x, k, b)
    gg = jax.grad(loss_stats, argnums=(0, 1, 2))(x, k, b)
    for a, bb, name in zip(gg, gw, "xkb"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_down_block_routes_through_bridge_identically(rng, monkeypatch):
    """Down(folded_in, folded_out, wpack_in) with the Pallas bridge forced
    on (interpret mode) equals the XLA fold_bridge route."""
    from vae_segmentation_tpu.models.blocks import Down

    x = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 64)), jnp.float32)
    mod = Down(4, dtype=jnp.float32, folded_in=True, folded_out=True,
               wpack_in=True)
    monkeypatch.setenv("VAESEG_STENCIL", "0")
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    want = mod.apply({"params": params}, x)
    monkeypatch.setenv("VAESEG_STENCIL", "1")
    got = mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_out_conv_fused_softmax_identically(rng, monkeypatch):
    """OutConv(softmax_classes=2) on the folded stencil path (fused
    conv+softmax kernel epilogue, interpret mode) equals conv -> folded
    softmax, forward and gradient."""
    from vae_segmentation_tpu.models.blocks import OutConv
    from vae_segmentation_tpu.ops import s2d

    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 128)), jnp.float32)
    mod = OutConv(2, dtype=jnp.float32, folded=True, wpack=True)
    monkeypatch.setenv("VAESEG_STENCIL", "1")
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    def fused(p, v):
        return mod.apply({"params": p}, v, softmax_classes=2)

    def plain(p, v):
        logits = mod.apply({"params": p}, v)
        return s2d.softmax_folded(logits, 2).astype(jnp.float32)

    got = fused(params, x)
    want = plain(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g1 = jax.grad(lambda p: jnp.sum(jnp.cos(fused(p, x))))(params)
    g0 = jax.grad(lambda p: jnp.sum(jnp.cos(plain(p, x))))(params)
    for (p1, l1), (_, l0) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g0)[0]):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-4, atol=1e-5, err_msg=str(p1))


def test_folded_softmax_pre_exact(rng):
    """conv3_stencil_folded_softmax_pre == softmax_folded(conv(relu(x*s+t)))
    — forward and gradients through x, s, t, k, b."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.stencil3 import (
        conv3_stencil_folded_softmax_pre)

    nc, cin_l = 2, 2
    kf = jnp.asarray(rng.normal(size=(3, 3, 3, cin_l, nc)) * 0.4,
                     jnp.float32)
    ke = s2d.expand_kernel_w(s2d.expand_kernel3_fast(kf))
    cl = 16 * cin_l
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, cl)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(1, cl)) * 0.5 + 1.0, jnp.float32)
    t = jnp.asarray(rng.normal(size=(1, cl)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(16 * nc,)), jnp.float32)

    def expand(kfv):
        return s2d.expand_kernel_w(s2d.expand_kernel3_fast(kfv))

    def ref(xv, sv, tv, kfv, bv):
        xn = jnp.maximum(xv * sv[:, None, None, None, :]
                         + tv[:, None, None, None, :], 0.0)
        y = jax.lax.conv_general_dilated(
            xn, expand(kfv), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bv
        return s2d.softmax_folded(y.astype(jnp.float32), nc)

    def fused(xv, sv, tv, kfv, bv):
        return conv3_stencil_folded_softmax_pre(xv, sv, tv, expand(kfv),
                                                bv, True, None, nc)

    want = ref(x, s, t, kf, b)
    got = fused(x, s, t, kf, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    w_arr = jnp.asarray(rng.normal(size=want.shape), jnp.float32)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) * w_arr)

    # k compared at the LOGICAL kernel (through the expansion VJP): the
    # grouped dk is defined up to the fold-structure projection, exactly
    # like the models' param chain
    gw = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(x, s, t, kf, b)
    gg = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(x, s, t, kf, b)
    for a, bb, name in zip(gg, gw, ["x", "s", "t", "k", "b"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_down_bridge_w_pre_exact(rng):
    """down_bridge_w_pre == down_bridge of relu(x*s + t): forward, stats,
    and gradients through x, s, t, k, b."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.upbridge import (down_bridge_w,
                                                          down_bridge_w_pre)

    c, o = 4, 4
    cl = 16 * c
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4, cl)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(2, cl)) * 0.5 + 1.0, jnp.float32)
    t = jnp.asarray(rng.normal(size=(2, cl)) * 0.2, jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(o,)), jnp.float32)

    def ref(xv, sv, tv, kv, bv):
        xn = jnp.maximum(xv * sv[:, None, None, None, :]
                         + tv[:, None, None, None, :], 0.0)
        return down_bridge_w(xn, kv, bv)

    want = ref(x, s, t, k, b)
    got = down_bridge_w_pre(x, s, t, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    got_s, st = down_bridge_w_pre(x, s, t, k, b, True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(jnp.sum(want, axis=(1, 2, 3))),
        rtol=1e-5, atol=1e-4)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    gw = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(x, s, t, k, b)
    gg = jax.grad(loss(down_bridge_w_pre),
                  argnums=(0, 1, 2, 3, 4))(x, s, t, k, b)
    for a, bb, name in zip(gg, gw, ["x", "s", "t", "k", "b"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    # stats-path gradient
    def loss_stats(xv, sv, tv):
        y, stv = down_bridge_w_pre(xv, sv, tv, k, b, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(stv[:, 1] * 0.01)

    def loss_stats_ref(xv, sv, tv):
        y = ref(xv, sv, tv, k, b)
        return (jnp.sum(jnp.sin(y))
                + jnp.sum(jnp.sum(y.astype(jnp.float32) ** 2,
                                  axis=(1, 2, 3)) * 0.01))

    gw = jax.grad(loss_stats_ref, argnums=(0, 1, 2))(x, s, t)
    gg = jax.grad(loss_stats, argnums=(0, 1, 2))(x, s, t)
    for a, bb, name in zip(gg, gw, "xst"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_softmax_group_vjp_exact(rng):
    """ops/pallas/softmaxvjp.py == the jnp softmax-cotangent chain
    (g - sum_over_class_group(g*y)) * y, across bd block picks and both
    dtypes."""
    from vae_segmentation_tpu.ops.pallas.softmaxvjp import softmax_group_vjp

    for d, nc, fc, dt in ((4, 2, 32, jnp.float32), (6, 3, 48, jnp.bfloat16),
                          (2, 2, 16, jnp.float32)):
        g = jnp.asarray(rng.normal(size=(2, d, 4, 8, fc)), dt)
        y = jnp.asarray(rng.random((2, d, 4, 8, fc)), dt)
        blk = jnp.arange(fc) // nc
        gmat = (blk[:, None] == blk[None, :]).astype(jnp.float32)
        g32, y32 = g.astype(jnp.float32), y.astype(jnp.float32)
        want = ((g32 - (g32 * y32) @ gmat) * y32).astype(dt)
        got = softmax_group_vjp(g, y, nc)
        assert got.dtype == dt
        np.testing.assert_allclose(
            np.asarray(got, jnp.float32), np.asarray(want, jnp.float32),
            rtol=2e-2 if dt == jnp.bfloat16 else 1e-6,
            atol=2e-2 if dt == jnp.bfloat16 else 1e-6)


def test_multi_soft_dice_deep_wpack_rep(rng):
    """multi_soft_dice is rep-agnostic as long as the class axis stays
    lane-minor — which the recursive W-pack preserves (tests/test_s2d.py
    test_conv3_deep_wpack_exact). Pin the loss side of the planned
    lane-dense class-2 rep (BENCH.md round-5 lever #1): per-class Dice on
    the twice-W-packed rep equals the same volumes' Dice on the plain
    folded rep."""
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.dicesums import multi_soft_dice

    n = 2
    x = jnp.asarray(rng.random((2, 8, 8, 32, n)), jnp.float32)
    t = jnp.asarray(rng.random((2, 8, 8, 32, n)) > 0.5, jnp.float32)
    deep = lambda v: s2d.fold_w(s2d.fold_w(s2d.fold(v)))  # noqa: E731
    got = multi_soft_dice(deep(x).astype(jnp.bfloat16),
                          (deep(t).astype(jnp.bfloat16),), n, eps=L.EVAL_EPS)
    want = multi_soft_dice(s2d.fold(x).astype(jnp.bfloat16),
                           (s2d.fold(t).astype(jnp.bfloat16),), n,
                           eps=L.EVAL_EPS)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=2e-3, atol=2e-3)
