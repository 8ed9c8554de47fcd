"""Train-step parity: the REAL reference adaptation step (torch CPU) vs our
jitted adapt step — same weights, same batches, same optimizer.

This is the evidence chain for the north-star Dice-parity claim that cannot
be measured here directly (no real NIH/MSD data, no multi-GPU rig): if the
forward pass matches (tests/test_torch_compat.py), the LOSS + GRADIENT +
SGD UPDATE match (this file, step 1), and a multi-step trajectory tracks
within fp noise with equal validation dice at the end, then the two
frameworks train the same model.

Reference step driven here with the reference's OWN modules
(/root/reference/joint_model.py, utils/evaluation.py):
  student/teacher forward   main_target.py:531-537
  pseudo binarize           main_target.py:534-537
  dh type-8 loss            main_target.py:550-560
  backward + SGD            main_target.py:734-736
  frozen VAE                main_target.py:396-399
  teacher <- student init   main_target.py:427-428
"""

import copy
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_DIR, requires_reference

torch = pytest.importorskip("torch")

SIDE = 64
BOTT = 2048  # 256 channels x (64/32)^3: torch InstanceNorm3d
             # requires >1 spatial element in training mode, so the
             # VAE bottleneck must be 2^3, not 1^3 (side 64 minimum)
DIM = 8
LR = 1e-2
LAMBDA_VAE = 1.0
N_STEPS = 4


def _load_ref_evaluation():
    spec = importlib.util.spec_from_file_location(
        "ref_evaluation", os.path.join(REFERENCE_DIR, "utils",
                                       "evaluation.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_env():
    """Reference modules with CPU shims (the reference hardcodes .cuda())."""
    sys.path.insert(0, REFERENCE_DIR)
    import joint_model

    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield joint_model, _load_ref_evaluation()
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REFERENCE_DIR)


def _vae_forward_param(self, x, if_random=False, scale=1, mid_input=False,
                       dropout=0.0):
    """The reference VAE.forward (joint_model.py:227-272) with its two
    hardcoded 128^3 views (`view(B,16384)` / `view(B,256,4,4,4)`,
    joint_model.py:241,255) made parametric so the full Joint runs at the
    test size. Every submodule call is the reference's own module; bound
    onto the reference VAE instances below."""
    assert not mid_input
    x = self.in_block(x)
    for down in (self.down1, self.down2, self.down3, self.down4, self.down5):
        x = down(x)
    b, ch, side = x.size(0), x.size(1), x.size(2)
    x = x.view(b, -1)
    x_mean = self.fc_mean(x)
    x_std = torch.nn.ReLU()(self.fc_std(x))
    z = torch.randn(x_mean.size(0), x_mean.size(1))
    if if_random:
        x = self.fc2(x_mean + z * x_std * scale)
    else:
        x = self.fc2(x_mean)
    x = x.view(b, ch, side, side, side)
    for up in (self.up1, self.up2, self.up3, self.up4, self.up5):
        x = up(x)
        if dropout:
            x = torch.nn.functional.dropout(x, p=dropout, training=True)
    x = self.final(self.out_block(x))
    return x, x_mean, x_std


def _make_batches(rng, n=2):
    batches = []
    for _ in range(n):
        img = rng.normal(size=(1, SIDE, SIDE, SIDE)).astype(np.float32)
        lab = (rng.random((1, SIDE, SIDE, SIDE)) > 0.7).astype(np.float32)
        batches.append((img, lab))
    return batches


def _dh8_final(recon_loss, fake_loss, lambda_vae):
    """dh type-8 schedule (main_target.py:550-560, kl off)."""
    if recon_loss < 0.15:
        cur = lambda_vae * 0.6
    elif recon_loss < 0.225:
        cur = lambda_vae * 1.2
    elif recon_loss < 0.3:
        cur = lambda_vae * 2.0
    else:
        cur = lambda_vae * 3.0
    if cur > 1:
        return recon_loss + 1.0 / cur * fake_loss
    return cur * recon_loss + fake_loss


def _build_torch_joint(ref_models):
    """Reference Joint (Seg + parametric-view VAE at the test size) plus a
    frozen deepcopied teacher (model_fix.load_state_dict(model...),
    main_target.py:427-428); student VAE frozen (main_target.py:396-399).
    Shared with tests/test_convergence_adapt.py."""
    seg = ref_models.Segmentation(n_channels=1, n_class=2, norm_type=1)
    vae = ref_models.VAE(n_channels=2, n_class=2, norm_type=1, dim=DIM)
    vae.fc_mean = torch.nn.Linear(BOTT, DIM)
    vae.fc_std = torch.nn.Linear(BOTT, DIM)
    vae.fc2 = torch.nn.Linear(DIM, BOTT)
    joint = ref_models.Joint([seg, vae], vae_forward_scale=0.0)

    teacher = copy.deepcopy(joint)
    # parametric-view forward for the test size (see _vae_forward_param)
    joint.Vae.forward = types.MethodType(_vae_forward_param, joint.Vae)
    teacher.Vae.forward = types.MethodType(_vae_forward_param, teacher.Vae)
    for p in teacher.parameters():
        p.requires_grad = False
    teacher.eval()
    for p in joint.Vae.parameters():
        p.requires_grad = False
    joint.Vae.eval()
    return joint, teacher


@pytest.fixture(scope="module")
def torch_run(ref_env):
    """N_STEPS of the reference adaptation loop; returns the initial state
    dict, per-step losses, post-step-1 and final state dicts, and the final
    validation dice."""
    ref_models, ev = ref_env
    torch.manual_seed(0)
    joint, teacher = _build_torch_joint(ref_models)

    sd0 = {k: v.numpy().copy() for k, v in joint.state_dict().items()}
    opt = torch.optim.SGD(joint.parameters(), lr=LR, weight_decay=0.0,
                          momentum=0.9)

    rng = np.random.default_rng(7)
    batches = _make_batches(rng)
    losses, snapshots = [], {}
    for step_i in range(N_STEPS):
        img, lab = batches[step_i % len(batches)]
        ti = torch.from_numpy(img[:, None])
        lab_long = torch.from_numpy(lab[:, None]).long()
        onehot = torch.zeros(1, 2, SIDE, SIDE, SIDE).scatter_(
            1, lab_long, 1)
        batch = {"venous": ti, "venous_pancreas_only": onehot}
        batch = joint(batch, "venous", "venous_pancreas_pred",
                      "venous_pancreas_recon_pred", dropout=True)
        with torch.no_grad():
            tb = teacher({"venous": ti}, "venous",
                         "venous_pancreas_only_fake", "unused")
        batch["venous_pancreas_only_fake"] = ev.binarize(
            tb["venous_pancreas_only_fake"])

        recon_loss = 1 - ev.avg_dsc(
            batch, source_key="venous_pancreas_pred",
            target_key="venous_pancreas_recon_pred", botindex=1, topindex=2)
        fake_loss = 1 - ev.avg_dsc(
            batch, source_key="venous_pancreas_pred",
            target_key="venous_pancreas_only_fake", botindex=1, topindex=2)
        dsc_loss = 1 - ev.avg_dsc(
            batch, source_key="venous_pancreas_pred",
            target_key="venous_pancreas_only", botindex=1, topindex=2)
        final = _dh8_final(recon_loss, fake_loss, LAMBDA_VAE)

        opt.zero_grad()
        final.backward()
        opt.step()
        losses.append({"recon_loss": float(recon_loss.detach()),
                       "dice_loss_fake": float(fake_loss.detach()),
                       "dice_loss": float(dsc_loss.detach()),
                       "final_loss": float(final.detach())})
        if step_i == 0:
            snapshots["after1"] = {k: v.numpy().copy()
                                   for k, v in joint.state_dict().items()}
    snapshots["final"] = {k: v.numpy().copy()
                          for k, v in joint.state_dict().items()}

    # validation: binarized dice of the trained student on a held-out case
    vimg, vlab = _make_batches(np.random.default_rng(99), 1)[0]
    joint.eval()
    with torch.no_grad():
        vb = joint({"venous": torch.from_numpy(vimg[:, None])}, "venous",
                   "p", "r")
    vlab_long = torch.from_numpy(vlab[:, None]).long()
    vonehot = torch.zeros(1, 2, SIDE, SIDE, SIDE).scatter_(1, vlab_long, 1)
    vb["gt"] = vonehot
    val_dice = float(ev.avg_dsc(vb, source_key="p", target_key="gt",
                                binary=True, botindex=1, topindex=2))
    return {"sd0": sd0, "losses": losses, "snapshots": snapshots,
            "batches": batches, "val": (vimg, vlab), "val_dice": val_dice}


@pytest.fixture(scope="module")
def jax_run(torch_run):
    """The same N_STEPS through our jitted adapt step, from the same
    weights."""
    from vae_segmentation_tpu.models import Joint
    from vae_segmentation_tpu.models.torch_compat import convert_state_dict
    from vae_segmentation_tpu.train import (AdaptConfig, default_sched,
                                            init_state, make_adapt_step,
                                            optim)

    model = Joint(n_class=2, dim=DIM, bottleneck=BOTT, dtype=jnp.float32,
                  trunk_remat=False)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, SIDE, SIDE, SIDE, 1)))["params"]
    params = jax.tree.map(
        jnp.asarray, convert_state_dict(torch_run["sd0"], template, "joint"))
    teacher_params = jax.tree.map(jnp.copy, params)

    tx = optim.freeze_vae(optim.sgd(LR), params)
    cfg = AdaptConfig(n_class=2, domain_loss_type=8)
    step = make_adapt_step(model, model, tx, cfg)
    state = init_state(params, tx)
    sched = default_sched(lambda_vae=LAMBDA_VAE)

    losses, snapshots = [], {}
    for step_i in range(N_STEPS):
        img, lab = torch_run["batches"][step_i % 2]
        state, aux = step(state, teacher_params, jnp.asarray(img),
                          jnp.asarray(lab),
                          jax.random.PRNGKey(step_i), sched)
        losses.append({k: float(aux[k]) for k in
                       ("recon_loss", "dice_loss_fake", "dice_loss",
                        "final_loss")})
        if step_i == 0:
            snapshots["after1"] = jax.tree.map(np.asarray, state.params)
    snapshots["final"] = jax.tree.map(np.asarray, state.params)

    from vae_segmentation_tpu.ops import losses as L

    vimg, vlab = torch_run["val"]
    pred = model.apply({"params": state.params},
                       jnp.asarray(vimg)[..., None], method=Joint.segment)
    val_dice = float(L.avg_dsc(pred, L.one_hot_label(jnp.asarray(vlab), 2),
                               binary=True, botindex=1, topindex=2))
    return {"losses": losses, "snapshots": snapshots, "val_dice": val_dice,
            "template": template}


def _rel_l2(a, b):
    return (np.linalg.norm((a - b).ravel())
            / (np.linalg.norm(b.ravel()) + 1e-12))


@requires_reference
def test_adapt_step1_loss_parity(torch_run, jax_run):
    """Step-1 losses (recon, pseudo-dice, gt-dice, dh-8 final) match the
    reference step to fp32 tolerance."""
    for k in ("recon_loss", "dice_loss_fake", "dice_loss", "final_loss"):
        t, j = torch_run["losses"][0][k], jax_run["losses"][0][k]
        assert abs(t - j) < 2e-4, (k, t, j)


@requires_reference
def test_adapt_step1_update_parity(torch_run, jax_run):
    """The SGD update applied by step 1 (lr * grad through student Seg+VAE)
    matches the reference's backward+step per parameter tensor.

    Excluded: biases of convs whose output feeds InstanceNorm. The norm
    subtracts the per-channel mean, so a constant channel offset is
    analytically a no-op and its gradient is exactly zero in infinite
    precision — what both frameworks compute there is pure fp32 roundoff
    (measured cos similarity ~0 between the two noise vectors, while the
    functional out_block bias agrees to 0.1%). Kernel gradients pass
    through the same ~10 norm layers of cancellation, which leaves a
    measured fp32 noise floor of a few percent on the deepest layers —
    hence the 0.15 rel-L2 / 0.99-cosine bound, with the end-to-end check
    (trajectory + val dice, next test) pinning the tight tolerance."""
    from vae_segmentation_tpu.models.torch_compat import convert_state_dict

    t0 = convert_state_dict(torch_run["sd0"], jax_run["template"], "joint")
    t1 = convert_state_dict(torch_run["snapshots"]["after1"],
                            jax_run["template"], "joint")
    j1 = jax_run["snapshots"]["after1"]

    flat_t0 = dict(jax.tree_util.tree_flatten_with_path(t0["Seg"])[0])
    flat_t1 = dict(jax.tree_util.tree_flatten_with_path(t1["Seg"])[0])
    flat_j1 = dict(jax.tree_util.tree_flatten_with_path(j1["Seg"])[0])
    checked = 0
    for path in flat_t0:
        key = jax.tree_util.keystr(path)
        norm_cancelled_bias = "bias" in key and "out_block" not in key
        dt = np.asarray(flat_t1[path]) - np.asarray(flat_t0[path])
        dj = np.asarray(flat_j1[path]) - np.asarray(flat_t0[path])
        nt = np.linalg.norm(dt.ravel())
        if norm_cancelled_bias:
            # roundoff-only leaf: both frameworks' updates are tiny noise
            assert np.linalg.norm(dj.ravel()) < 1e-2, (key, dj)
            continue
        if nt == 0:
            assert np.linalg.norm(dj.ravel()) < 1e-9, path
            continue
        cos = float(dj.ravel() @ dt.ravel()
                    / (np.linalg.norm(dj.ravel()) * nt + 1e-30))
        # the out_block BIAS gradient never touches an upstream activation
        # (it is the summed softmax cotangent), so it is nearly noise-free;
        # every kernel gradient contracts against normed activations and
        # carries the few-percent noise floor
        tol = 0.02 if ("out_block" in key and "bias" in key) else 0.15
        assert _rel_l2(dj, dt) < tol, (key, _rel_l2(dj, dt))
        assert cos > 0.99, (key, cos)
        checked += 1
    assert checked > 10  # every Seg tensor actually moved and was compared

    # frozen VAE: both frameworks leave it bit-identical
    for (pth, v1), (_, v0) in zip(
            jax.tree_util.tree_flatten_with_path(j1["Vae"])[0],
            jax.tree_util.tree_flatten_with_path(t0["Vae"])[0]):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0),
                                      err_msg=str(pth))


@requires_reference
def test_adapt_trajectory_and_val_dice_parity(torch_run, jax_run):
    """4-step trajectories track within fp drift; the binarized validation
    dice of the two trained students agrees within 0.5 points (the
    north-star Dice tolerance, BASELINE.json)."""
    for i, (lt, lj) in enumerate(zip(torch_run["losses"],
                                     jax_run["losses"])):
        for k in ("recon_loss", "dice_loss_fake", "final_loss"):
            assert abs(lt[k] - lj[k]) < 3e-3, (i, k, lt[k], lj[k])
    assert abs(torch_run["val_dice"] - jax_run["val_dice"]) < 0.005, (
        torch_run["val_dice"], jax_run["val_dice"])
