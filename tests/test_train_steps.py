"""Train-step tests on tiny models: losses are finite, decrease over a few
steps, frozen subtrees stay frozen, EMA math is exact, and the dh loss
schedule reproduces the reference's branch arithmetic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.models import Joint, SegUNet, ShapeVAE
from vae_segmentation_tpu.train import (
    AdaptConfig,
    adapt_loss,
    default_sched,
    ema_update_seg,
    init_state,
    make_adapt_step,
    make_finetune_step,
    make_seg_train_step,
    make_vae_train_step,
    optim,
)

FMAPS = (2, 3, 4, 5, 6, 8)
BOT = 8
D = 32
KEY = jax.random.PRNGKey(0)


def clone(tree):
    """Deep-copy a param tree: the train steps donate their state buffers, so
    shared fixture params must never be passed into a step directly."""
    return jax.tree.map(jnp.array, tree)


def _blob_batch(b=2, d=D, seed=0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[0:d, 0:d, 0:d]
    labs, imgs = [], []
    for _ in range(b):
        c = rng.uniform(0.4 * d, 0.6 * d, 3)
        r = rng.uniform(0.15 * d, 0.3 * d)
        lab = (((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
               < r ** 2).astype(np.float32)
        labs.append(lab)
        imgs.append(lab * 0.8 + rng.normal(0, 0.05, (d, d, d)))
    return (jnp.asarray(np.stack(imgs), jnp.float32),
            jnp.asarray(np.stack(labs), jnp.float32))


def test_vae_train_step_loss_decreases():
    model = ShapeVAE(n_class=2, dim=8, fmaps=FMAPS, bottleneck=BOT,
                     dtype=jnp.float32)
    _, lab = _blob_batch()
    onehot_probe = jnp.zeros((1, D, D, D, 2))
    params = model.init({"params": KEY, "reparam": KEY}, onehot_probe)["params"]
    tx = optim.sgd(0.05)
    step = make_vae_train_step(model, tx, n_class=2)
    state = init_state(params, tx)
    first = last = None
    for i in range(8):
        state, m = step(state, lab, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["dice_loss"])
        last = float(m["dice_loss"])
    assert np.isfinite(last)
    assert last < first
    assert int(state.step) == 8


def test_seg_train_step_loss_decreases():
    model = SegUNet(n_class=2, fmaps=FMAPS, dtype=jnp.float32)
    img, lab = _blob_batch()
    params = model.init({"params": KEY}, img[..., None])["params"]
    tx = optim.sgd(0.1)
    step = make_seg_train_step(model, tx, n_class=2)
    state = init_state(params, tx)
    first = last = None
    for _ in range(8):
        state, m = step(state, img, lab)
        if first is None:
            first = float(m["dice_loss"])
        last = float(m["dice_loss"])
    assert np.isfinite(last) and last < first


@pytest.fixture(scope="module")
def joint_setup():
    model = Joint(n_class=2, dim=8, fmaps=FMAPS, bottleneck=BOT,
                  dtype=jnp.float32, seg_dropout=0.0, vae_decoder_dropout=0.0)
    img, lab = _blob_batch()
    params = model.init({"params": KEY, "reparam": KEY},
                        img[..., None])["params"]
    return model, img, lab, params


def test_adapt_step_runs_and_vae_frozen(joint_setup):
    model, img, lab, params = joint_setup
    tx = optim.freeze_vae(optim.sgd(0.05), params)
    cfg = AdaptConfig(n_class=2, domain_loss_type=8)
    step = make_adapt_step(model, model, tx, cfg)
    state = init_state(clone(params), tx)
    teacher_params = clone(params)
    vae_before = jax.tree.map(lambda x: np.asarray(x), state.params["Vae"])
    sched = default_sched(1.0)
    for i in range(3):
        state, m = step(state, teacher_params, img, lab,
                        jax.random.PRNGKey(i), sched)
    assert np.isfinite(float(m["final_loss"]))
    # the VAE subtree must be bit-identical (frozen via optimizer mask)
    for a, b in zip(jax.tree.leaves(vae_before),
                    jax.tree.leaves(state.params["Vae"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    # the Seg subtree must have moved
    assert any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(params["Seg"]),
                        jax.tree.leaves(state.params["Seg"])))


def test_adapt_step_prefolded_ingest_parity(monkeypatch):
    """The folded adapt step accepts ingest-PREFOLDED image/label (the 5-D
    s2d rep cli/common._train_ingest emits with fold>0) and computes the
    same metrics and parameter update as the raw step-entry-fold contract
    (the reorg just moves from the step into the ingest jit)."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    from vae_segmentation_tpu.models.blocks import stage_wpack
    from vae_segmentation_tpu.ops import s2d

    model = Joint(n_class=2, dim=8, fmaps=FMAPS, bottleneck=BOT,
                  dtype=jnp.float32, seg_dropout=0.0,
                  vae_decoder_dropout=0.0, folded_io=True)
    img, lab = _blob_batch()
    params = model.init({"params": KEY, "reparam": KEY},
                        img[..., None])["params"]
    tx = optim.freeze_vae(optim.sgd(0.05), params)
    cfg = AdaptConfig(n_class=2, domain_loss_type=8, folded=True)
    step = make_adapt_step(model, model, tx, cfg)
    sched = default_sched(1.0)
    teacher = clone(params)

    state0, m0 = step(init_state(clone(params), tx), teacher, img, lab,
                      KEY, sched)
    wp = stage_wpack(FMAPS)
    img_f = s2d.fold_rep(img[..., None], wp)
    lab_f = s2d.fold_rep(lab.astype(jnp.bfloat16)[..., None], wp)
    state1, m1 = step(init_state(clone(params), tx), teacher, img_f,
                      lab_f, KEY, sched)

    for k in m0:
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m0[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for (p1, l1), (_, l0) in zip(
            jax.tree_util.tree_flatten_with_path(state1.params)[0],
            jax.tree_util.tree_flatten_with_path(state0.params)[0]):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-4, atol=1e-6, err_msg=str(p1))


def test_seg_replay_step_folded_parity(monkeypatch):
    """--pseudo_list replay on the folded fast path: make_seg_replay_step on
    a folded_io Joint fed ingest-PREFOLDED tensors computes the same loss and
    parameter update as the raw-rep step on the eval view (dice sums are
    fold-invariant), so folding the replay batch changes only its speed."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    from vae_segmentation_tpu.models.blocks import stage_wpack
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.train import make_seg_replay_step

    kw = dict(n_class=2, dim=8, fmaps=FMAPS, bottleneck=BOT,
              dtype=jnp.float32, seg_dropout=0.0, vae_decoder_dropout=0.0)
    model = Joint(folded_io=True, **kw)
    model_eval = Joint(**kw)
    img, lab = _blob_batch()
    params = model.init({"params": KEY, "reparam": KEY},
                        img[..., None])["params"]
    tx = optim.freeze_vae(optim.sgd(0.05), params)

    step_raw = make_seg_replay_step(model_eval, tx, 2)
    state0, m0 = step_raw(init_state(clone(params), tx), img, lab)

    wp = stage_wpack(FMAPS)
    img_f = s2d.fold_rep(img[..., None], wp)
    lab_f = s2d.fold_rep(lab.astype(jnp.bfloat16)[..., None], wp)
    step_fold = make_seg_replay_step(model, tx, 2)
    state1, m1 = step_fold(init_state(clone(params), tx), img_f, lab_f)

    np.testing.assert_allclose(np.asarray(m1["dice_loss"]),
                               np.asarray(m0["dice_loss"]),
                               rtol=2e-5, atol=1e-6)
    for (p1, l1), (_, l0) in zip(
            jax.tree_util.tree_flatten_with_path(state1.params)[0],
            jax.tree_util.tree_flatten_with_path(state0.params)[0]):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-4, atol=1e-6, err_msg=str(p1))


def test_train_ingest_fold_emission(monkeypatch):
    """_train_ingest(fold=k) output == fold_rep of the raw ingest output
    (same warp, same normalize — the fold is a pure layout emission)."""
    from vae_segmentation_tpu.cli.common import _train_ingest
    from vae_segmentation_tpu.ops import s2d

    img, lab = _blob_batch()
    key = jax.random.PRNGKey(3)
    raw_i, raw_l = _train_ingest(img, lab, key, (D, D, D), False)
    for fold, wp in ((1, False), (2, True)):
        fi, fl = _train_ingest(img, lab, key, (D, D, D), False, 1, fold)
        np.testing.assert_array_equal(
            np.asarray(fi), np.asarray(s2d.fold_rep(raw_i[..., None], wp)))
        np.testing.assert_array_equal(
            np.asarray(fl),
            np.asarray(s2d.fold_rep(raw_l.astype(jnp.bfloat16)[..., None],
                                    wp)))


def test_finetune_step_runs(joint_setup):
    model, img, lab, params = joint_setup
    tx = optim.freeze_vae(optim.sgd(0.01, momentum=0.0), params)
    cfg = AdaptConfig(n_class=2, domain_loss_type=8)
    step = make_finetune_step(model, model, tx, cfg)
    state = init_state(clone(params), tx)
    state, m = step(state, clone(params), img[:1], lab[:1], KEY,
                    default_sched(1.0))
    assert np.isfinite(float(m["final_loss"]))


def test_ema_update_exact(joint_setup):
    model, img, lab, params = joint_setup
    student = jax.tree.map(lambda x: x + 1.0, params)
    out = ema_update_seg(clone(params), student, 0.995)
    for t0, t1 in zip(jax.tree.leaves(params["Seg"]),
                      jax.tree.leaves(out["Seg"])):
        # float32 FMA/fusion differences between XLA and numpy leave a few
        # ulps of slack; 1e-5 is still far below any training-relevant scale
        np.testing.assert_allclose(np.asarray(t1),
                                   0.995 * np.asarray(t0)
                                   + 0.005 * (np.asarray(t0) + 1.0),
                                   rtol=2e-5, atol=1e-7)
    # Vae untouched
    for t0, t1 in zip(jax.tree.leaves(params["Vae"]),
                      jax.tree.leaves(out["Vae"])):
        np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


# ------------------------------------------------------- dh loss arithmetic

def _ref_train_loss(recon, fake, lam, loss_type, turn=None, warm=1.0, kl=False,
                    klv=0.0):
    """Reference main_target.py:548-592 restated in plain python."""
    if loss_type in (8, 15, 16):
        if recon < 0.15:
            cur = lam * 0.6
        elif recon < 0.225:
            cur = lam * 1.2
        elif recon < 0.3:
            cur = lam * 2.0
        else:
            cur = lam * 3.0
        if cur > 1:
            return recon + (klv if kl else 0.0) + fake / cur
        return cur * (recon + (klv if kl else 0.0)) + fake if kl \
            else cur * recon + fake
    if turn is not None:
        return lam * recon if turn == 0 else lam * recon + fake
    return warm * lam * recon + fake


@pytest.mark.parametrize("recon", [0.1, 0.2, 0.27, 0.5])
@pytest.mark.parametrize("lam", [0.1, 1.0, 2.0])
def test_adapt_loss_type8_matches_reference(recon, lam):
    cfg = AdaptConfig(n_class=2, domain_loss_type=8)
    sched = default_sched(lam)
    got = adapt_loss(jnp.float32(recon), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, sched)
    want = _ref_train_loss(recon, 0.3, lam, 8)
    np.testing.assert_allclose(float(got), want, rtol=1e-6)


def test_adapt_loss_default_and_turn_and_warmup():
    cfg = AdaptConfig(n_class=2, domain_loss_type=0)
    sched = default_sched(0.5)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, sched)
    np.testing.assert_allclose(float(got), 0.5 * 0.4 + 0.3, rtol=1e-6)
    # warmup ramp
    sched["warmup_scale"] = jnp.float32(0.25)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, sched)
    np.testing.assert_allclose(float(got), 0.25 * 0.5 * 0.4 + 0.3, rtol=1e-6)
    # turn phase 0: recon only
    cfg_t = AdaptConfig(n_class=2, turn_enabled=True)
    sched = default_sched(0.5)
    sched["turn_phase"] = jnp.int32(0)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg_t, sched)
    np.testing.assert_allclose(float(got), 0.5 * 0.4, rtol=1e-6)


def test_adapt_loss_only_pseudo():
    cfg = AdaptConfig(n_class=2, only_pseudo=True, domain_loss_type=8)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, default_sched(1.0))
    np.testing.assert_allclose(float(got), 0.3, rtol=1e-6)


def test_adapt_loss_finetune_variants():
    sched = default_sched(1.0)
    # type 12 finetune: lam*recon + fake + (1-recon)*(1-fake)
    cfg = AdaptConfig(n_class=2, domain_loss_type=12)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.3), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, sched, variant="finetune")
    np.testing.assert_allclose(float(got), 0.4 + 0.3 + 0.6 * 0.7, rtol=1e-6)
    # type 15 finetune: relu shifts
    cfg = AdaptConfig(n_class=2, domain_loss_type=15)
    got = adapt_loss(jnp.float32(0.4), jnp.float32(0.05), jnp.float32(0.0),
                     jnp.float32(0.0), cfg, sched, variant="finetune")
    np.testing.assert_allclose(float(got), 0.3 + 0.0, rtol=1e-6)


def test_vae_step_fused_reparam_scale0_exact(rng, monkeypatch):
    """The fused reparam+KL path (VAESEG_FUSED_REPARAM=1) equals the XLA
    path exactly at scale=0 (latent = mean; KL is eps-independent), proving
    the wiring end-to-end. At scale>0 the two paths draw from different —
    equally valid — normal streams (kernel docstring)."""
    from vae_segmentation_tpu.models import ShapeVAE
    from vae_segmentation_tpu.train import (init_state, make_vae_train_step,
                                            optim)

    model = ShapeVAE(n_class=2, dim=8, fmaps=(2, 3, 4, 5, 6, 8),
                     bottleneck=8, dtype=jnp.float32)
    lab = jnp.asarray(rng.random((2, 32, 32, 32)) > 0.7, jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 32, 2)))["params"]
    tx = optim.sgd(1e-2)

    def run(flag):
        monkeypatch.setenv("VAESEG_FUSED_REPARAM", flag)
        step = make_vae_train_step(model, tx, 2, scale=0.0)
        st = init_state(jax.tree.map(jnp.copy, params), tx)
        st, aux = step(st, lab, jax.random.PRNGKey(3))
        return aux, jax.tree.leaves(st.params)[0]

    a1, w1 = run("1")
    a0, w0 = run("0")
    assert abs(float(a1["dice_loss"]) - float(a0["dice_loss"])) < 1e-6
    assert abs(float(a1["kl_loss"]) - float(a0["kl_loss"])) < 1e-5 * (
        1.0 + abs(float(a0["kl_loss"])))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), rtol=1e-6,
                               atol=1e-7)
