"""ft1 (test-time-training) step parity for the FINETUNE-path loss forks.

The reference's val_finetune inner loop (main_target.py:807-900) re-derives
the dh loss with three variants that DIFFER from the train path:

    type 12: + (1 - recon) * (1 - fake)   (main_target.py:860-861; train
             path uses - recon * fake, :573-574)
    type 13: hinge at 0.15 via torch.maximum (:862-864)
    type 15: hinge BOTH recon and fake at 0.1 (:870-875; the train path
             lumps 15 in with type 8, :550)

This drives 2 ft1 inner steps per type with the reference's OWN modules
(torch CPU, SGD momentum=0 re-created per step, frozen teacher + frozen
student VAE, main_target.py:330-336,886-887) against our
make_finetune_step, from identical weights: step-1 loss parity pins the
loss fork, step-2 loss parity pins the applied update, and the adapted
students' predictions agree.

Complements tests/test_train_parity.py (train-path dh8) and
tests/test_convergence_adapt.py (convergence-length flagship run).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import requires_reference
from tests.test_train_parity import (LAMBDA_VAE, SIDE, _build_torch_joint,
                                     _make_batches, ref_env)  # noqa: F401

torch = pytest.importorskip("torch")

FT1_TYPES = (12, 13, 15)
FT1_STEPS = 2
LR_FT = 3e-3
DIM = 8
BOTT = 2048


def _ft1_final_torch(t, recon_loss, fake_loss):
    """The ft1-path loss forks, reference math (main_target.py:835-884)."""
    if t == 12:
        return (LAMBDA_VAE * recon_loss + fake_loss
                + (1 - recon_loss) * (1 - fake_loss))
    if t == 13:
        return LAMBDA_VAE * torch.clamp(recon_loss - 0.15, min=0.0)
    assert t == 15
    return (LAMBDA_VAE * torch.clamp(recon_loss - 0.1, min=0.0)
            + torch.clamp(fake_loss - 0.1, min=0.0))


@pytest.fixture(scope="module")
def ft1_torch(ref_env):  # noqa: F811
    ref_models, ev = ref_env
    torch.manual_seed(3)
    joint, teacher = _build_torch_joint(ref_models)
    sd0 = {k: v.numpy().copy() for k, v in joint.state_dict().items()}
    img, lab = _make_batches(np.random.default_rng(17), 1)[0]
    ti = torch.from_numpy(img[:, None])

    joint.eval()
    with torch.no_grad():
        pb0 = joint({"venous": ti}, "venous", "p", "r")
    joint.train()
    pred0 = pb0["p"].numpy().copy()

    out = {}
    for t in FT1_TYPES:
        joint.load_state_dict({k: torch.from_numpy(v)
                               for k, v in sd0.items()})
        losses, preds = [], []
        for _ in range(FT1_STEPS):
            batch = joint({"venous": ti}, "venous", "p", "r", dropout=True)
            with torch.no_grad():
                tb = teacher({"venous": ti}, "venous", "f", "unused")
            batch["f"] = ev.binarize(tb["f"])
            recon_loss = 1 - ev.avg_dsc(batch, source_key="p",
                                        target_key="r", botindex=1,
                                        topindex=2)
            fake_loss = 1 - ev.avg_dsc(batch, source_key="p",
                                       target_key="f", botindex=1,
                                       topindex=2)
            final = _ft1_final_torch(t, recon_loss, fake_loss)
            # optimizer re-created every inner step (main_target.py:886-887)
            opt = torch.optim.SGD(joint.parameters(), lr=LR_FT,
                                  weight_decay=0.0, momentum=0)
            opt.zero_grad()
            final.backward()
            opt.step()
            losses.append({"recon_loss": float(recon_loss.detach()),
                           "dice_loss_fake": float(fake_loss.detach()),
                           "final_loss": float(final.detach())})
            joint.eval()
            with torch.no_grad():
                pb = joint({"venous": ti}, "venous", "p", "r")
            joint.train()
            preds.append(pb["p"].numpy().copy())
        out[t] = {"losses": losses, "preds": preds}
    return {"sd0": sd0, "img": img, "lab": lab, "out": out, "pred0": pred0}


@pytest.fixture(scope="module")
def ft1_jax(ft1_torch):
    from vae_segmentation_tpu.models import Joint
    from vae_segmentation_tpu.models.torch_compat import convert_state_dict
    from vae_segmentation_tpu.train import (AdaptConfig, default_sched,
                                            init_state, make_finetune_step,
                                            optim)

    model = Joint(n_class=2, dim=DIM, bottleneck=BOTT, dtype=jnp.float32,
                  trunk_remat=False)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, SIDE, SIDE, SIDE, 1)))["params"]
    params0 = jax.tree.map(
        jnp.asarray, convert_state_dict(ft1_torch["sd0"], template, "joint"))
    teacher_params = jax.tree.map(jnp.copy, params0)
    sched = default_sched(lambda_vae=LAMBDA_VAE)
    img = jnp.asarray(ft1_torch["img"])[..., None]
    lab = jnp.asarray(ft1_torch["lab"])

    out = {}
    for t in FT1_TYPES:
        # the exact CLI wiring (cli/target_main.py:271-275)
        tx = optim.freeze_vae(
            optim.sgd(LR_FT, momentum=0.0, weight_decay=0.0), params0)
        cfg = AdaptConfig(n_class=2, domain_loss_type=t)
        step = make_finetune_step(model, model, tx, cfg)
        state = init_state(jax.tree.map(jnp.copy, params0), tx)
        losses, preds = [], []
        for i in range(FT1_STEPS):
            state, aux = step(state, teacher_params, img, lab,
                              jax.random.PRNGKey(i), sched)
            losses.append({k: float(aux[k]) for k in
                           ("recon_loss", "dice_loss_fake", "final_loss")})
            pred = model.apply({"params": state.params}, img,
                               method=Joint.segment)
            # NCDHW to compare with torch
            preds.append(np.asarray(pred).transpose(0, 4, 1, 2, 3))
        out[t] = {"losses": losses, "preds": preds}
    return out


@requires_reference
@pytest.mark.parametrize("t", FT1_TYPES)
def test_ft1_loss_fork_parity(ft1_torch, ft1_jax, t):
    """Step-1 losses match the reference ft1 fork to fp32 tolerance; step-2
    losses (computed on the updated student) pin the applied SGD update."""
    for i in range(FT1_STEPS):
        lt, lj = ft1_torch["out"][t]["losses"][i], ft1_jax[t]["losses"][i]
        for k in ("recon_loss", "dice_loss_fake", "final_loss"):
            tol = 2e-4 if i == 0 else 3e-3
            assert abs(lt[k] - lj[k]) < tol, (t, i, k, lt[k], lj[k])


@requires_reference
@pytest.mark.parametrize("t", FT1_TYPES)
def test_ft1_adapted_prediction_parity(ft1_torch, ft1_jax, t):
    """Step 1 moves both frameworks' predictions the same way: the
    probability DELTAS from the shared initial model are strongly aligned
    (probe 2026-08-19: cos 0.994, norms within 1%) and equally sized.
    Asserted after step 1 only: each kernel gradient carries a few-percent
    fp32 noise floor through ~10 InstanceNorm cancellation layers (per
    test_train_parity.test_adapt_step1_update_parity — per-tensor update
    cos stays >= 0.997 here too), and a random-init near-0.5 softmax
    amplifies that chaotically by step 2 (delta cos drops to ~0.6 while
    the step-2 LOSSES on the same weights still match to 3e-3, previous
    test) — the same sensitivity the convergence tests handle by comparing
    dice trajectories, not voxels."""
    p0 = ft1_torch["pred0"]
    dt_ = (ft1_torch["out"][t]["preds"][0] - p0).ravel()
    dj_ = (ft1_jax[t]["preds"][0] - p0).ravel()
    cos = float(dt_ @ dj_ / (np.linalg.norm(dt_) * np.linalg.norm(dj_)
                             + 1e-30))
    assert cos > 0.97, (t, cos)
    ratio = float(np.linalg.norm(dj_) / (np.linalg.norm(dt_) + 1e-30))
    assert 0.9 < ratio < 1.12, (t, ratio)


@requires_reference
def test_ft1_type13_moves_recon_only(ft1_torch):
    """Type 13's loss is the hinged recon term alone — the pseudo term must
    not enter (distinguishes it from 14/15)."""
    l0 = ft1_torch["out"][13]["losses"][0]
    assert abs(l0["final_loss"]
               - LAMBDA_VAE * max(l0["recon_loss"] - 0.15, 0.0)) < 1e-6
