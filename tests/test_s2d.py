"""Exactness of the space-to-depth conv transform (ops/s2d.py): every
folded op must match its unfolded original to fp tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from vae_segmentation_tpu.ops import s2d


@pytest.fixture()
def x8(rng):
    return jnp.asarray(rng.normal(size=(2, 8, 8, 16, 3)), jnp.float32)


def test_fold_unfold_roundtrip(x8):
    np.testing.assert_array_equal(np.asarray(s2d.unfold(s2d.fold(x8))),
                                  np.asarray(x8))


def test_expand_kernel_fast_matches_spec(rng):
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)), jnp.float32)
    slow = s2d.expand_kernel3(k)
    fast = s2d.expand_kernel3_fast(k)
    np.testing.assert_array_equal(np.asarray(slow), np.asarray(fast))


def test_conv3_folded_exact(rng, x8):
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)) * 0.3, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x8, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold(s2d.conv3_folded(s2d.fold(x8), k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_down_conv_folded_exact(rng, x8):
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 7)) * 0.3, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x8, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = jax.lax.conv_general_dilated(
        s2d.fold(x8), s2d.expand_down_kernel(k), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_up_convtranspose_folded_exact(rng, x8):
    ct = nn.ConvTranspose(6, kernel_size=(2, 2, 2), strides=(2, 2, 2),
                          padding="VALID")
    params = ct.init({"params": jax.random.PRNGKey(0)}, x8)
    want = ct.apply(params, x8)
    k = params["params"]["kernel"]
    b = params["params"]["bias"]
    got_folded = jax.lax.conv_general_dilated(
        x8, s2d.expand_up_kernel(k), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold(got_folded) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fold_conv_fused_exact(rng, x8):
    """conv3 then fold == one 4^3 stride-2 conv on the raw input."""
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)) * 0.3, jnp.float32)
    want = s2d.fold(jax.lax.conv_general_dilated(
        x8, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    got = s2d.fold_conv(x8, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_instance_norm_folded_exact(rng, x8):
    from vae_segmentation_tpu.models.blocks import instance_norm

    want = instance_norm(x8)
    got = s2d.unfold(s2d.instance_norm_folded(s2d.fold(x8), x8.shape[-1]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_softmax_folded_exact(rng, x8):
    want = jax.nn.softmax(x8, axis=-1)
    got = s2d.unfold(s2d.softmax_folded(s2d.fold(x8), x8.shape[-1])
                     .astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_segunet_s2d_model_parity(rng):
    """Whole SegUNet: s2d on vs off must agree to fp tolerance with the
    SAME params (the transform is exact and the param tree identical)."""
    from vae_segmentation_tpu.models import SegUNet

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)), jnp.float32)
    m_off = SegUNet(n_class=2, dtype=jnp.float32, s2d=False)
    m_on = SegUNet(n_class=2, dtype=jnp.float32, s2d=True)
    params = m_off.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    p2 = m_on.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    want = m_off.apply({"params": params}, x)
    got = m_on.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_vae_s2d_model_parity(rng):
    from vae_segmentation_tpu.models import ShapeVAE

    oh = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 2, (1, 32, 32, 32))), 2,
        dtype=jnp.float32)
    # 32^3 input, 5 stride-2 stages -> 1^3 x 256 bottleneck
    kw = dict(n_class=2, dim=16, bottleneck=256, dtype=jnp.float32)
    m_off = ShapeVAE(s2d=False, **kw)
    m_on = ShapeVAE(s2d=True, **kw)
    params = m_off.init({"params": jax.random.PRNGKey(0)}, oh)["params"]
    r_off, mu_off, sd_off = m_off.apply({"params": params}, oh)
    r_on, mu_on, sd_on = m_on.apply({"params": params}, oh)
    np.testing.assert_allclose(np.asarray(mu_on), np.asarray(mu_off),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sd_on), np.asarray(sd_off),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_on), np.asarray(r_off),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_adapt_step_folded_metric_parity(rng, monkeypatch):
    """One full teacher-student adaptation step with the folded pipeline
    (Joint folded_io + folded losses) must produce the same losses and
    parameter updates as the unfolded one."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    from vae_segmentation_tpu.models import Joint
    from vae_segmentation_tpu.train import (AdaptConfig, default_sched,
                                            init_state, make_adapt_step,
                                            optim)

    img = jnp.asarray(rng.normal(size=(1, 32, 32, 32)), jnp.float32)
    lab = jnp.asarray(rng.random((1, 32, 32, 32)) > 0.8, jnp.float32)
    kw = dict(n_class=2, dim=16, bottleneck=256, dtype=jnp.float32)
    m_f = Joint(folded_io=True, **kw)
    m_u = Joint(folded_io=False, **kw)
    params = m_u.init({"params": jax.random.PRNGKey(0)},
                      img[..., None])["params"]
    tx = optim.freeze_vae(optim.sgd(1e-2), params)
    sched = default_sched(1.0)
    key = jax.random.PRNGKey(1)

    from vae_segmentation_tpu.train import make_finetune_step

    outs = {}
    for name, mdl, folded in (("fold", m_f, True), ("plain", m_u, False)):
        cfg = AdaptConfig(n_class=2, domain_loss_type=8, folded=folded)
        step = make_adapt_step(mdl, mdl, tx, cfg)
        st = init_state(jax.tree.map(jnp.copy, params), tx)
        teacher = jax.tree.map(jnp.copy, params)
        st, metrics = step(st, teacher, img, lab, key, sched)
        # the ft1 inner step must accept the same folded pipeline
        ft = make_finetune_step(mdl, mdl, tx, cfg)
        _, ft_metrics = ft(init_state(jax.tree.map(jnp.copy, params), tx),
                           teacher, img, lab, key, sched)
        metrics = dict(metrics,
                       ft_final=ft_metrics["final_loss"])
        outs[name] = (st, metrics)

    for k in ("recon_loss", "dice_loss_fake", "dice_loss", "final_loss",
              "ft_final"):
        np.testing.assert_allclose(float(outs["fold"][1][k]),
                                   float(outs["plain"][1][k]),
                                   rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(outs["fold"][0].params),
                    jax.tree.leaves(outs["plain"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_grad_through_folded_conv(rng, x8):
    """Weight gradients through the expansion equal the unfolded conv's."""
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 3)) * 0.3, jnp.float32)

    def loss_folded(k):
        y = s2d.conv3_folded(s2d.fold(x8), k)
        return jnp.sum(y ** 2)

    def loss_ref(k):
        y = jax.lax.conv_general_dilated(
            x8, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y ** 2)

    gf = jax.grad(loss_folded)(k)
    gr = jax.grad(loss_ref)(k)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# W-packing (the 128-lane production rep: s2d.fold_w on top of fold)
# ---------------------------------------------------------------------------

def test_fold_w_roundtrip(x8):
    xf = s2d.fold(x8)
    np.testing.assert_array_equal(
        np.asarray(s2d.unfold_w(s2d.fold_w(xf))), np.asarray(xf))
    np.testing.assert_array_equal(
        np.asarray(s2d.unfold_rep(s2d.fold_rep(x8, True), x8.shape[-1])),
        np.asarray(x8))


def test_conv3_wpacked_exact(rng, x8):
    """3^3 SAME conv == stencil algebra on the W-PACKED rep."""
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 3, 5)) * 0.3, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x8, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    kw = s2d.expand_kernel_w(s2d.expand_kernel3_fast(k))
    xw = s2d.fold_w(s2d.fold(x8))
    got = jax.lax.conv_general_dilated(
        xw, kw, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold_rep(got, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_down_conv_wpacked_exact(rng, x8):
    """Stride-2 2^3 conv == 1^3 conv on the W-PACKED rep (W-PAIRED out)."""
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 6)) * 0.3, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x8, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    xw = s2d.fold_w(s2d.fold(x8))
    got = jax.lax.conv_general_dilated(
        xw, s2d.expand_down_kernel_w(k), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold_w(got)  # W-PAIRED coarse -> plain coarse
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_up_convtranspose_wpacked_exact(rng, x8):
    """2^3 stride-2 ConvTranspose == width-2 stride-2 conv emitting the
    W-PACKED folded rep."""
    k = jnp.asarray(rng.normal(size=(2, 2, 2, 3, 4)) * 0.3, jnp.float32)
    want = jax.lax.conv_transpose(
        x8, k, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = jax.lax.conv_general_dilated(
        x8, s2d.expand_up_kernel_w(k), (1, 1, s2d.WPACK), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold_rep(got, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_norm_softmax_wpacked_exact(rng, x8):
    """instance_norm_folded / softmax_folded are rep-agnostic: identical
    numbers on the W-PACKED rep (stats group per original channel)."""
    from vae_segmentation_tpu.models.blocks import instance_norm

    c = x8.shape[-1]
    xw = s2d.fold_w(s2d.fold(x8))
    got_n = s2d.unfold_rep(s2d.instance_norm_folded(xw, c), c)
    np.testing.assert_allclose(np.asarray(got_n),
                               np.asarray(instance_norm(x8)),
                               rtol=1e-4, atol=1e-4)
    got_s = s2d.unfold_rep(s2d.softmax_folded(xw, c), c)
    want_s = jax.nn.softmax(x8.astype(jnp.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-5, atol=1e-5)


def test_down_fold_bridge_exact(rng, x8):
    """expand_down_fold_kernel(_w): the folded->folded stride-2 Down conv
    equals stride-2-conv-then-fold on the unfolded tensors."""
    from vae_segmentation_tpu.ops import s2d

    c, o = 4, 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)), jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref_folded = s2d.fold(ref)

    got = jax.lax.conv_general_dilated(
        s2d.fold(x), s2d.expand_down_fold_kernel(k), (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_folded),
                               rtol=1e-5, atol=1e-5)

    got_w = jax.lax.conv_general_dilated(
        s2d.fold_w(s2d.fold(x)), s2d.expand_down_fold_kernel_w(k),
        (2, 2, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_folded),
                               rtol=1e-5, atol=1e-5)


def test_up_fold_bridge_exact(rng):
    """expand_up_fold_kernel(_w): the folded->folded stride-2 ConvTranspose
    equals unfold -> stride-2 ConvTranspose -> fold on the plain tensors."""
    from vae_segmentation_tpu.ops import s2d

    c, o = 4, 4
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, c)), jnp.float32)  # coarse
    k = jnp.asarray(rng.normal(size=(2, 2, 2, c, o)), jnp.float32)

    ref = jax.lax.conv_transpose(
        x, k, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref_folded = s2d.fold(ref)

    got = jax.lax.conv_transpose(
        s2d.fold(x), s2d.expand_up_fold_kernel(k),
        strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_folded),
                               rtol=1e-5, atol=1e-5)

    got_w = jax.lax.conv_transpose(
        s2d.fold(x), s2d.expand_up_fold_kernel_w(k),
        strides=(2, 2, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    np.testing.assert_allclose(np.asarray(got_w),
                               np.asarray(s2d.fold_w(ref_folded)),
                               rtol=1e-5, atol=1e-5)


def test_conv3_deep_wpack_exact(rng):
    """The W-pack composes RECURSIVELY: fold_w applied twice (lane-dense
    rep for small-channel volumes, e.g. the 2-class probability tensors —
    BENCH.md round-5 final trace, lever #1) with expand_kernel_w applied
    twice still equals the logical 3^3 SAME conv. Each fold level is the
    same per-axis index rule, so exactness is inherited level by level;
    this test pins the composition so the deep-rep plumbing can rely on
    it."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32, 2)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 2, 2)) * 0.3, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    kd = s2d.expand_kernel_w(s2d.expand_kernel_w(s2d.expand_kernel3_fast(k)))
    xd = s2d.fold_w(s2d.fold_w(s2d.fold(x)))  # [2,4,4,4,64]: W/8 in lanes
    got = jax.lax.conv_general_dilated(
        xd, kd, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.unfold(s2d.unfold_w(s2d.unfold_w(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_norm_softmax_deep_wpack_exact(rng):
    """instance_norm_folded / softmax_folded are lane-layout-agnostic
    (stats/groups keyed by the original channel count), so they hold
    unchanged on the deep W-packed rep — class axis stays lane-minor."""
    from vae_segmentation_tpu.models.blocks import instance_norm

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32, 2)), jnp.float32)
    c = x.shape[-1]
    xd = s2d.fold_w(s2d.fold_w(s2d.fold(x)))
    unfold_d = lambda t: s2d.unfold(s2d.unfold_w(s2d.unfold_w(t)))  # noqa
    np.testing.assert_allclose(
        np.asarray(unfold_d(s2d.instance_norm_folded(xd, c))),
        np.asarray(instance_norm(x)), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(unfold_d(s2d.softmax_folded(xd, c))),
        np.asarray(jax.nn.softmax(x.astype(jnp.float32), axis=-1)),
        rtol=1e-5, atol=1e-5)
