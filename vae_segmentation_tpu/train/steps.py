"""Compiled train steps — one jitted pure function per method family.

Each reference training method (main_source.py:249-275 / main_target.py
:316-344 dispatch) maps to a step factory here:

  vae_train           -> make_vae_train_step      (main_source.py:389-413)
  seg_train           -> make_seg_train_step      (main_source.py:415-446)
  joint_train         -> make_joint_train_step    (main_source.py:448-478)
  domain_adaptation   -> make_adapt_step          (main_target.py:505-613)
    (cached-pseudo source variant: pass `pseudo` explicitly,
     main_source.py:480-544)
  val_finetune (ft1)  -> make_finetune_step       (main_target.py:807-900)
  discriminator_train -> make_discriminator_step  (main_target.py:494-503)
  domain_adaptation_dis -> make_adapt_dis_step    (main_target.py:693-732)

The dynamic-hyperparameter ("dh") loss schedule (domain_loss_type 8-16,
main_target.py:548-592 train path, :835-884 test-time-training path) is
`adapt_loss` below: loss-type selection is static (config), the
recon-loss-bucketed lambda is traced (jnp.select / jnp.where) — no Python
branching on runtime values inside jit.

Epoch-level scalars that change between steps without recompiling
(lambda_vae incl. --tag decay, warmup ramp, turn_epoch phase) travel in the
`sched` dict of traced scalars.
"""

from __future__ import annotations

from dataclasses import dataclass
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vae_segmentation_tpu.models.joint import Joint, Joint2
from vae_segmentation_tpu.ops import losses as L
from vae_segmentation_tpu.ops import s2d
from vae_segmentation_tpu.train.optim import stop_gradient_frozen


def _folded_onehot(label: jax.Array, n_class: int,
                   wpack: bool = False) -> jax.Array:
    """fold(one_hot(label)) computed the cheap way: fold the integer label
    volume (33 MB, not the 1 GB one-hot) then one-hot into a 6D view
    [B, D/2, H/2, W/2, P, C] (P = 8, or 16 in the W-PACKED production rep —
    must match the model's folded output layout element-for-element).

    A 5-D label is the ingest-PREFOLDED rep (cli/common._train_ingest
    emits it so the fold reorg fuses into the augmentation gather instead
    of running as a step-entry copy); only the one-hot compare remains."""
    if label.ndim == 5:
        lab_f = label.astype(jnp.bfloat16)
    else:
        # bf16 before the fold: class ids are small ints (exact in bf16)
        # and the fold is a layout transpose — half the bytes of f32
        lab_f = s2d.fold(label.astype(jnp.bfloat16)[..., None])
        # [B, D/2, H/2, W/2, 8]
        if wpack:
            lab_f = s2d.fold_w(lab_f)   # [B, D/2, H/2, W/4, 16]
    # float equality compare, not one_hot: the int32 cast materializes s32
    # copies of the folded volume with layout fixes (losses.one_hot_label)
    classes = jnp.arange(n_class, dtype=lab_f.dtype)
    return (lab_f[..., None] == classes).astype(jnp.bfloat16)


def _classes_view(x: jax.Array, n_class: int, folded: bool) -> jax.Array:
    """Model output -> loss view: folded [*, P*C] -> 6D [*, P, C] (works for
    both the plain fold (P=8) and the W-PACKED rep (P=16))."""
    if folded:
        return x.reshape(*x.shape[:-1], -1, n_class)
    return x


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def init_state(params, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


def _apply_updates(state: TrainState, tx, grads) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return TrainState(step=state.step + 1,
                      params=optax.apply_updates(state.params, updates),
                      opt_state=new_opt)


def default_sched(lambda_vae: float) -> Dict[str, jnp.ndarray]:
    return {
        "lambda_vae": jnp.float32(lambda_vae),
        "warmup_scale": jnp.float32(1.0),   # epoch/warmup clamp, 1 == past warmup
        "turn_phase": jnp.int32(1),         # 1 -> recon+pseudo, 0 -> recon only
    }


# --------------------------------------------------------------------------
# source-domain steps
# --------------------------------------------------------------------------

def use_fused_reparam() -> bool:
    """Route the VAE train step's reparam draw + KL through the fused
    Pallas kernel (ops/pallas/reparam.py: on-core TPU PRNG + one VMEM pass
    over the [B, dim] latent stats) — ON by default on TPU (the north-star
    fused-op surface; the latent is tiny so this is about keeping the
    subgraph out of XLA's way, not milliseconds). VAESEG_FUSED_REPARAM=0/1
    overrides. Note the TPU PRNG is a different (equally valid) normal
    stream than the host-keyed XLA draw; at scale=0 the two paths are
    bitwise identical (tests/test_train_steps.py). Mesh-safe: under an
    active multi-chip mesh the kernel runs per 'data' shard via shard_map
    with a scalar KL pmean (reparam._run_mesh; ragged batches fall back),
    so the gate needs no mesh logic."""
    env = os.environ.get("VAESEG_FUSED_REPARAM")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def use_fused_dice() -> bool:
    """Route the adaptation step's three same-pred soft Dices through the
    fused multi-target sums kernel (ops/pallas/dicesums.py: every volume
    read once, no f32 full-res temporaries — ~4 ms/step of the round-3
    trace's fusion pool). ON by default on TPU; VAESEG_FUSED_DICE=0/1
    overrides. Mesh-safe: under an active multi-chip mesh the kernel runs
    per shard via shard_map — 'data' splits the batch, 'spatial' splits D
    with a [B,8,L] partial-sum psum (dicesums._run_mesh; ragged shapes fall
    back to the unwrapped op), so the gate needs no mesh logic and the
    flagship DP4xSP2 mesh never sees an opaque pallas_call."""
    env = os.environ.get("VAESEG_FUSED_DICE")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def make_vae_train_step(model, tx, n_class: int, *, scale: float = 0.35,
                        kl_weight: float = 2e-5, eps: float = L.SOURCE_EPS,
                        return_display: bool = False):
    """VAE shape-prior step (main_source.py:389-413):
    loss = (1 - avg_dsc(recon, onehot)[1:]) + 2e-5 * KL, reparam scale 0.35.

    return_display adds the reference's train-time TB panel to the aux dict:
    [gt class0, gt class1, recon class1] mid-W slices of sample 0
    (main_source.py:394-396)."""
    fused = use_fused_reparam()

    def step(state: TrainState, label: jax.Array, key: jax.Array):
        onehot = L.one_hot_label(label, n_class)

        def loss_fn(p):
            if fused:
                from vae_segmentation_tpu.models.vae import ShapeVAE
                from vae_segmentation_tpu.ops.pallas import reparam_kl

                mean, std = model.apply({"params": p}, onehot,
                                        method=ShapeVAE.encode)
                seed = jax.random.randint(key, (), 0,
                                          jnp.iinfo(jnp.int32).max)
                latent, klv = reparam_kl(mean, std, scale, seed)
                recon = model.apply({"params": p}, latent,
                                    method=ShapeVAE.decode)
            else:
                recon, mean, std = model.apply(
                    {"params": p}, onehot, if_random=True, scale=scale,
                    rngs={"reparam": key})
                klv = L.kl_loss(mean, std)
            dsc_loss = 1.0 - L.avg_dsc(recon, onehot, botindex=1,
                                       topindex=n_class, eps=eps)
            return dsc_loss + kl_weight * klv, (dsc_loss, klv, recon)

        (_, (dsc_loss, klv, recon)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        aux = {"dice_loss": dsc_loss, "kl_loss": klv}
        if return_display:
            w2 = onehot.shape[3] // 2
            aux["display"] = jax.lax.stop_gradient(jnp.stack([
                onehot[0, :, :, w2, 0], onehot[0, :, :, w2, 1],
                recon[0, :, :, w2, 1].astype(jnp.float32)]))
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,))


def make_seg_train_step(model, tx, n_class: int, *, eps: float = L.SOURCE_EPS):
    """Supervised segmentation step (main_source.py:415-446):
    loss = 1 - avg_dsc(pred, onehot)[1:]."""

    def step(state: TrainState, image: jax.Array, label: jax.Array):
        onehot = L.one_hot_label(label, n_class)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            pred = model.apply({"params": p}, image[..., None])
            dsc_loss = 1.0 - L.avg_dsc(pred, onehot, botindex=1,
                                       topindex=n_class, eps=eps)
            return dsc_loss, pred

        (dsc_loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"dice_loss": dsc_loss}

    return jax.jit(step, donate_argnums=(0,))


def make_seg_replay_step(model: Joint, tx, n_class: int, *,
                         eps: float = L.SOURCE_EPS):
    """Source-replay step of the --pseudo_list runs (main_target.py:668-691):
    plain GT dice on the student Seg — on the SAME ingest-prefolded s2d
    contract as the adaptation step, so the replay batch rides the folded
    Pallas fast path instead of dropping to the raw-rep convs (the round-4
    unfolded fallback cost the two domain_*_pseudo.bash recipes the whole
    folded speedup). Dice sums are fold-invariant, so the loss equals the
    raw-rep make_seg_train_step number (tests/test_train_steps.py)."""
    from vae_segmentation_tpu.models.blocks import stage_wpack

    wp = model.folded_io and stage_wpack(model.fmaps)

    def step(state: TrainState, image: jax.Array, label: jax.Array):
        img = image if image.ndim == 5 else image[..., None]
        onehot = _folded_onehot(label, n_class, wp) if model.folded_io \
            else L.one_hot_label(label, n_class)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            pred = model.apply({"params": p}, img, method=Joint.segment)
            pred_v = _classes_view(pred, n_class, model.folded_io)
            dsc_loss = 1.0 - L.avg_dsc(pred_v, onehot, botindex=1,
                                       topindex=n_class, eps=eps)
            return dsc_loss, pred

        (dsc_loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"dice_loss": dsc_loss}

    return jax.jit(step, donate_argnums=(0,))


def make_joint_train_step(model: Joint, tx, n_class: int, *,
                          eps: float = L.SOURCE_EPS):
    """joint_train (main_source.py:448-478):
    loss = lambda_vae * (1 - dsc(pred, recon)) + (1 - dsc(pred, onehot))."""

    def step(state: TrainState, image: jax.Array, label: jax.Array,
             sched: Dict[str, jax.Array]):
        onehot = L.one_hot_label(label, n_class)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            pred, recon, _, _ = model.apply({"params": p}, image[..., None])
            recon_loss = 1.0 - L.avg_dsc(pred, recon, botindex=1,
                                         topindex=n_class, eps=eps)
            dsc_loss = 1.0 - L.avg_dsc(pred, onehot, botindex=1,
                                       topindex=n_class, eps=eps)
            return sched["lambda_vae"] * recon_loss + dsc_loss, \
                (recon_loss, dsc_loss)

        (_, (recon_loss, dsc_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"recon_loss": recon_loss, "dice_loss": dsc_loss}

    return jax.jit(step, donate_argnums=(0,))


# --------------------------------------------------------------------------
# the dh loss schedule
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class AdaptConfig:
    """Static switches of the adaptation loss (argparse flags)."""

    n_class: int = 2
    domain_loss_type: int = 0          # --domain_loss_type
    only_pseudo: bool = False          # --only_pseudo
    use_confident_binarize: bool = False  # --use_confident_binarize
    kl: bool = False                   # --kl
    vae_mont_number: int = 1           # --vae_mont_number
    turn_enabled: bool = False         # --turn_epoch != -1
    kl_weight: float = 2e-5
    # emit a [4, H, W] mid-slice panel (recon/gt/pred/pseudo) in the aux
    # dict for the TB image grid (main_target.py:538-541); off by default —
    # it is a device->host transfer per display step
    return_display: bool = False
    # the models exchange space-to-depth tensors (Joint folded_io=True):
    # labels are folded on device and every loss runs on the folded rep —
    # dice sums are fold-invariant, so the numbers are identical. Whether
    # that rep is additionally W-PACKED (s2d.fold_w) is derived from the
    # model (models.blocks.stage_wpack) inside the step factories.
    folded: bool = False


def _bucket_lambda(recon_loss, lambda_vae):
    """dh bucketing (main_target.py:551-554): factor 0.6 / 1.2 / 2.0 / 3.0 at
    recon-loss thresholds .15 / .225 / .3."""
    factor = jnp.select(
        [recon_loss < 0.15, recon_loss < 0.225, recon_loss < 0.3],
        [0.6, 1.2, 2.0], 3.0)
    return lambda_vae * factor


def adapt_loss(recon_loss, fake_loss, klv, pred_sq_mean, cfg: AdaptConfig,
               sched: Dict[str, jax.Array], *, variant: str = "train"):
    """The full domain_loss_type dispatch.

    variant='train'    -> main_target.py:548-592
    variant='finetune' -> main_target.py:835-884 (ft1 path; differs at loss
                          types 12, 13, 15)
    variant='pseudo'   -> main_target.py:642-653 (--pseudo_list branch:
                          only type 8 [un-normalized], the lambda>=1000
                          recon-only mode, and the plain default)
    """
    lam = sched["lambda_vae"]
    t = cfg.domain_loss_type
    if cfg.only_pseudo:
        return fake_loss
    if variant == "pseudo":
        if t == 8:
            cur = _bucket_lambda(recon_loss, lam)
            return jnp.where(cur > 1.0,
                             recon_loss + fake_loss / cur,
                             cur * recon_loss + fake_loss)
        return jnp.where(lam >= 1000.0,
                         recon_loss * lam / 10000.0,
                         lam * recon_loss + fake_loss)
    if (variant == "train" and t in (8, 15, 16)) or \
       (variant == "finetune" and t == 8):
        cur = _bucket_lambda(recon_loss, lam)
        if cfg.kl:
            hi = recon_loss + klv + fake_loss / cur
            lo = cur * (recon_loss + klv) + fake_loss
        else:
            hi = recon_loss + fake_loss / cur
            lo = cur * recon_loss + fake_loss
        return jnp.where(cur > 1.0, hi, lo)
    if t == 9:
        cur = _bucket_lambda(recon_loss, lam)
        return (cur * recon_loss + fake_loss) / (1.0 + cur)
    if t == 10:
        # reference intent (main_target.py:854-856): confidence penalty
        # mean(pred^2) + recon + pseudo. (The train-path copy at :567-569
        # references val_batch — a latent NameError in the reference; the
        # ft1-path version is the working one and is what we implement.)
        return pred_sq_mean + recon_loss + fake_loss
    if t == 11:
        return lam * recon_loss + fake_loss + recon_loss * fake_loss
    if t == 12:
        if variant == "finetune":  # main_target.py:860-861
            return lam * recon_loss + fake_loss \
                + (1.0 - recon_loss) * (1.0 - fake_loss)
        return lam * recon_loss + fake_loss - recon_loss * fake_loss
    if t == 13:
        r = jnp.maximum(recon_loss - 0.15, 0.0)
        return lam * r
    if t == 14:
        r = jnp.maximum(recon_loss - 0.1, 0.0)
        return lam * r + fake_loss
    if variant == "finetune" and t == 15:  # main_target.py:870-875
        r = jnp.maximum(recon_loss - 0.1, 0.0)
        f = jnp.maximum(fake_loss - 0.1, 0.0)
        return lam * r + f
    if cfg.turn_enabled:
        # (epoch // turn_epoch) % 2: phase 0 -> recon only (main_target.py:583-587)
        return jnp.where(sched["turn_phase"] == 0,
                         lam * recon_loss,
                         lam * recon_loss + fake_loss)
    # default: warmup ramp then lambda*recon + pseudo (main_target.py:588-592);
    # with --kl (type 0), + 2e-5 * lambda * KL once past warmup.
    base = sched["warmup_scale"] * lam * recon_loss + fake_loss
    if cfg.kl and variant == "train":
        base = base + jnp.where(sched["warmup_scale"] >= 1.0,
                                cfg.kl_weight * lam * klv, 0.0)
    return base


# --------------------------------------------------------------------------
# teacher-student adaptation
# --------------------------------------------------------------------------

def _teacher_forward(teacher: Joint, teacher_params, img, need_kl: bool):
    """Teacher inference: Seg only, plus the VAE encode of the teacher's own
    prediction when the KL term is on — the reference computes mean/std via
    the teacher Joint forward (main_target.py:532 + joint_model.py:451); its
    full VAE *decode* output ('_asdfasdf') is never used, so we skip it."""
    t_pred = teacher.apply({"params": teacher_params}, img,
                           method=Joint.segment)
    if need_kl:
        t_mean, t_std = teacher.apply(
            {"params": teacher_params}, t_pred, method=Joint.encode_pred)
    else:
        t_mean = t_std = jnp.zeros((img.shape[0], 1), jnp.float32)
    return t_pred, t_mean, t_std


def _student_mc_losses(model: Joint, params, img, onehot, pseudo, klv,
                       cfg: AdaptConfig, sched, key, *, variant: str):
    """MC loop over vae_mont_number student forwards (main_target.py:530-603).
    The count is static and small (default 1) -> unrolled at trace time."""
    n = cfg.n_class
    tot_recon = tot_fake = tot_dsc = tot_final = 0.0
    display = None
    onehot_v = onehot if cfg.folded else _classes_view(onehot, n, False)
    pseudo_v = _classes_view(pseudo, n, cfg.folded)
    for i in range(cfg.vae_mont_number):
        sub = jax.random.fold_in(key, i)
        k_rep, k_drop = jax.random.split(sub)
        pred, recon, _, _ = model.apply(
            {"params": params}, img, dropout=True,
            rngs={"reparam": k_rep, "dropout": k_drop})
        pred_v = _classes_view(pred, n, cfg.folded)
        recon_v = _classes_view(recon, n, cfg.folded)
        if use_fused_dice():
            from vae_segmentation_tpu.ops.pallas.dicesums import \
                multi_soft_dice
            d_pr, d_ps, d_po = multi_soft_dice(
                pred_v, (recon_v, pseudo_v, onehot_v), n, eps=L.EVAL_EPS)
            recon_loss = 1.0 - jnp.mean(d_pr[:, 1:n])
            fake_loss = 1.0 - jnp.mean(d_ps[:, 1:n])
            dsc_loss = 1.0 - jnp.mean(d_po[:, 1:n])
        else:
            recon_loss = 1.0 - L.avg_dsc(pred_v, recon_v, botindex=1,
                                         topindex=n)
            fake_loss = 1.0 - L.avg_dsc(pred_v, pseudo_v, botindex=1,
                                        topindex=n)
            dsc_loss = 1.0 - L.avg_dsc(pred_v, onehot_v, botindex=1,
                                       topindex=n)
        pred_sq = jnp.mean(jnp.square(pred)) if cfg.domain_loss_type == 10 \
            else jnp.float32(0.0)
        final = adapt_loss(recon_loss, fake_loss, klv, pred_sq, cfg, sched,
                           variant=variant)
        tot_recon += recon_loss
        tot_fake += fake_loss
        tot_dsc += dsc_loss
        tot_final += final
        if cfg.return_display:
            # recon/gt/pred/pseudo mid-W slices of sample 0, class 1
            # (main_target.py:538-541 panel layout)
            if cfg.folded:
                pred_d, recon_d, pseudo_d = (s2d.unfold_rep(t, n) for t in
                                             (pred, recon, pseudo))
                onehot_d = s2d.unfold_rep(
                    onehot.reshape(*onehot.shape[:4], -1), n)
            else:
                pred_d, recon_d, pseudo_d, onehot_d = (pred, recon, pseudo,
                                                       onehot)
            w2 = pred_d.shape[3] // 2
            display = jax.lax.stop_gradient(jnp.stack([
                recon_d[0, :, :, w2, 1], onehot_d[0, :, :, w2, 1],
                pred_d[0, :, :, w2, 1], pseudo_d[0, :, :, w2, 1],
            ]).astype(jnp.float32))
    m = cfg.vae_mont_number
    aux = {"recon_loss": tot_recon / m, "dice_loss_fake": tot_fake / m,
           "dice_loss": tot_dsc / m}
    if cfg.return_display:
        aux["display"] = display
    return tot_final / m, aux


def make_adapt_step(model: Joint, teacher: Joint, tx, cfg: AdaptConfig, *,
                    variant: str = "train"):
    """Teacher-student adaptation step (main_target.py:505-613).

    Teacher forward is deterministic, so it is hoisted out of both the MC loop
    and the grad; gradients flow through the (frozen) student VAE into the
    student Seg via the optimizer mask (train/optim.py). variant='pseudo'
    selects the --pseudo_list loss subset (adapt_loss docstring)."""
    from vae_segmentation_tpu.models.blocks import stage_wpack

    wp = cfg.folded and stage_wpack(model.fmaps)

    def step(state: TrainState, teacher_params, image, label, key,
             sched: Dict[str, jax.Array]):
        # a 5-D image is the ingest-prefolded s2d rep (see _folded_onehot);
        # the entry convs consume it directly (models/blocks.Conv3)
        img = image if image.ndim == 5 else image[..., None]
        onehot = _folded_onehot(label, cfg.n_class, wp) if cfg.folded \
            else L.one_hot_label(label, cfg.n_class)
        t_pred, t_mean, t_std = _teacher_forward(teacher, teacher_params, img,
                                                 cfg.kl)
        pseudo = L.confident_binarize(t_pred) if cfg.use_confident_binarize \
            else L.binarize(t_pred)
        klv = L.kl_loss(t_mean, t_std) if cfg.kl else jnp.float32(0.0)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            return _student_mc_losses(model, p, img, onehot, pseudo, klv,
                                      cfg, sched, key, variant=variant)

        (final, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        aux = dict(aux, final_loss=final, kl_loss=klv)
        return new_state, aux

    return jax.jit(step, donate_argnums=(0,))


def make_cached_pseudo_adapt_step(model: Joint, tx, cfg: AdaptConfig, *,
                                  eps: float = L.SOURCE_EPS):
    """The main_source.py domain_adaptation variant (:480-544): pseudo labels
    are PRE-COMPUTED epoch-0 teacher predictions passed in as an array (the
    domain_cache/<prefix>/{idx}_pred contract), and the loss schedule is only
    turn/warmup (no dh types)."""

    def step(state: TrainState, image, label, pseudo, key,
             sched: Dict[str, jax.Array]):
        img = image[..., None]
        onehot = L.one_hot_label(label, cfg.n_class)
        n = cfg.n_class

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            pred, recon, _, _ = model.apply({"params": p}, img)
            recon_loss = 1.0 - L.avg_dsc(pred, recon, botindex=1, topindex=n,
                                         eps=eps)
            fake_loss = 1.0 - L.avg_dsc(pred, pseudo, botindex=1, topindex=n,
                                        eps=eps)
            dsc_loss = 1.0 - L.avg_dsc(pred, onehot, botindex=1, topindex=n,
                                       eps=eps)
            lam = sched["lambda_vae"]
            if cfg.turn_enabled:  # main_source.py:527-531
                final = jnp.where(sched["turn_phase"] == 0,
                                  2.0 * lam * recon_loss,
                                  lam * recon_loss + fake_loss)
            else:  # main_source.py:532-535
                final = sched["warmup_scale"] * lam * recon_loss + fake_loss
            return final, (recon_loss, fake_loss, dsc_loss, pred)

        (final, (recon_loss, fake_loss, dsc_loss, pred)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"recon_loss": recon_loss,
                           "dice_loss_fake": fake_loss,
                           "dice_loss": dsc_loss, "final_loss": final,
                           "pred": pred}

    return jax.jit(step, donate_argnums=(0,))


def make_finetune_step(model: Joint, teacher: Joint, tx, cfg: AdaptConfig):
    """One test-time-training inner step (ft1, main_target.py:807-900):
    same adaptation loss in its 'finetune' variant, SGD(momentum=0) — the
    reference re-creates the optimizer every step (main_target.py:886-887),
    which with momentum 0 is stateless SGD."""
    from vae_segmentation_tpu.models.blocks import stage_wpack

    wp = cfg.folded and stage_wpack(model.fmaps)

    def step(state: TrainState, teacher_params, image, label, key,
             sched: Dict[str, jax.Array]):
        img = image if image.ndim == 5 else image[..., None]
        onehot = _folded_onehot(label, cfg.n_class, wp) if cfg.folded \
            else L.one_hot_label(label, cfg.n_class)
        t_pred, t_mean, t_std = _teacher_forward(teacher, teacher_params, img,
                                                 cfg.kl)
        pseudo = L.confident_binarize(t_pred) if cfg.use_confident_binarize \
            else L.binarize(t_pred)
        klv = L.kl_loss(t_mean, t_std) if cfg.kl else jnp.float32(0.0)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            return _student_mc_losses(model, p, img, onehot, pseudo, klv,
                                      cfg, sched, key, variant="finetune")

        (final, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, dict(aux, final_loss=final)

    return jax.jit(step, donate_argnums=(0,))


# --------------------------------------------------------------------------
# latent-embedding methods (Embed: Encoder + VAE + Fusion)
# --------------------------------------------------------------------------

def make_embed_train_step(model, tx, n_class: int):
    """embed_train (main_source.py:546-589):
    final = (dsc(pred,gt) + dsc(init_seg,gt) + dsc(seg_recon,gt))/3
            + mse(latent, latent_gt)/10 + 2e-5*KL(latent_gt, latent_std)
            + dsc(gt_recon, gt)   [all as 1-dice losses]

    The reference toggles Encoder.requires_grad by epoch parity
    (main_source.py:551-555: frozen on even epochs). Here `enc_on` is a
    traced 0/1 scalar multiplying the Encoder gradient subtree — same update
    when on, zero update when off (momentum decay of stale velocity is the
    only deviation from torch's skip-entirely behavior; documented)."""

    def step(state: TrainState, image, label, key, enc_on: jax.Array):
        img = image[..., None]
        onehot = L.one_hot_label(label, n_class)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            out = model.apply({"params": p}, img, onehot, test_mode=True,
                              rngs={"reparam": key})
            kw = dict(botindex=1, topindex=n_class)
            d1 = 1.0 - L.avg_dsc(out["pred"], onehot, **kw)
            d2 = 1.0 - L.avg_dsc(out["init_seg"], onehot, **kw)
            inpaint = 1.0 - L.avg_dsc(out["seg_recon"], onehot, **kw)
            recon = 1.0 - L.avg_dsc(out["gt_recon"], onehot, **kw)
            klv = L.kl_loss(out["latent_code_gt"], out["latent_code_std"])
            mse = jnp.mean(jnp.square(out["latent_code"]
                                      - out["latent_code_gt"]))
            final = (d1 + d2 + inpaint) / 3.0 + mse / 10.0 \
                + 2e-5 * klv + recon
            return final, {"dice_loss1": d1, "dice_loss2": d2,
                           "mse_loss": mse, "inpaint_loss": inpaint,
                           "recon_loss": recon, "kl_loss": klv}

        (final, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = dict(grads)
        grads["Encoder"] = jax.tree.map(lambda g: g * enc_on,
                                        grads["Encoder"])
        new_state = _apply_updates(state, tx, grads)
        return new_state, dict(aux, final_loss=final)

    return jax.jit(step, donate_argnums=(0,))


def make_refine_vae_step(model, tx, n_class: int):
    """refine_vae (main_source.py:592-635): Encoder frozen (optimizer mask),
    VAE encoder stages frozen too (freeze_vae_encoder mask);
    final = inpaint + 2e-5*KL + recon."""

    def step(state: TrainState, image, label, key):
        img = image[..., None]
        onehot = L.one_hot_label(label, n_class)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            out = model.apply({"params": p}, img, onehot, test_mode=True,
                              rngs={"reparam": key})
            kw = dict(botindex=1, topindex=n_class)
            recon = 1.0 - L.avg_dsc(out["gt_recon"], onehot, **kw)
            inpaint = 1.0 - L.avg_dsc(out["seg_recon"], onehot, **kw)
            init_loss = 1.0 - L.avg_dsc(out["init_seg"], onehot, **kw)
            klv = L.kl_loss(out["latent_code_gt"], out["latent_code_std"])
            final = inpaint + 2e-5 * klv + recon
            return final, {"recon_loss": recon, "inpaint_loss": inpaint,
                           "init_loss": init_loss, "kl_loss": klv}

        (final, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, dict(aux, final_loss=final)

    return jax.jit(step, donate_argnums=(0,))


def make_sep_joint_train_step(model: Joint, teacher: Joint, tx, n_class: int):
    """sep_joint_train (main_source.py:631-658): student + frozen teacher
    Joint forwards; per-sample losses:
    final = 0.1*(1 - mean(recon)) + 1 - mean(dsc(pred, pred_tea) * recon_tea^2)."""

    def step(state: TrainState, teacher_params, image, label):
        img = image[..., None]
        kw = dict(botindex=1, topindex=n_class, return_mean=False)
        t_pred, t_recon, _, _ = teacher.apply({"params": teacher_params}, img)
        recon_tea = L.avg_dsc(t_pred, t_recon, **kw)  # [B]

        def loss_fn(p):
            pred, recon, _, _ = model.apply({"params": p}, img)
            recon_dsc = L.avg_dsc(pred, recon, **kw)
            dsc = L.avg_dsc(pred, t_pred, **kw)
            final = 0.1 * (1.0 - jnp.mean(recon_dsc)) \
                + 1.0 - jnp.mean(dsc * jnp.square(recon_tea))
            return final, {"recon_loss": 1.0 - jnp.mean(recon_dsc),
                           "dice_loss": 1.0 - jnp.mean(dsc)}

        (final, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, dict(aux, final_loss=final)

    return jax.jit(step, donate_argnums=(0,))


# --------------------------------------------------------------------------
# discriminator methods
# --------------------------------------------------------------------------

def make_discriminator_step(model, tx):
    """discriminator_train (main_target.py:494-503): MSE between the
    encoder's sigmoid score of a (one-channel float) mask and a target score."""

    def step(state: TrainState, mask: jax.Array, score: jax.Array):
        def loss_fn(p):
            out = model.apply({"params": p}, mask[..., None])
            return jnp.mean(jnp.square(score - out[:, 0])), out

        (final, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"final_loss": final, "score_out": out[:, 0]}

    return jax.jit(step, donate_argnums=(0,))


def make_adapt_dis_step(model: Joint2, teacher_seg, tx, cfg: AdaptConfig):
    """domain_adaptation_dis (main_target.py:693-732): pseudo Dice + a
    discriminator realism score in place of the VAE reconstruction loss:
    loss = warmup * lambda * (1 - mean score) + dice_fake."""

    def step(state: TrainState, teacher_params, image, label, key,
             sched: Dict[str, jax.Array]):
        img = image[..., None]
        n = cfg.n_class
        onehot = L.one_hot_label(label, n)
        t_pred = teacher_seg.apply({"params": teacher_params}, img)
        pseudo = L.confident_binarize(t_pred) if cfg.use_confident_binarize \
            else L.binarize(t_pred)

        def loss_fn(p):
            p = stop_gradient_frozen(p, tx)
            k_drop = jax.random.fold_in(key, 0)
            pred, score = model.apply({"params": p}, img, dropout=True,
                                      rngs={"dropout": k_drop})
            fake_loss = 1.0 - L.avg_dsc(pred, pseudo, botindex=1, topindex=n)
            dsc_loss = 1.0 - L.avg_dsc(pred, onehot, botindex=1, topindex=n)
            dis_loss = 1.0 - jnp.mean(score)
            final = sched["warmup_scale"] * sched["lambda_vae"] * dis_loss \
                + fake_loss
            return final, (dis_loss, fake_loss, dsc_loss)

        (final, (dis_loss, fake_loss, dsc_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = _apply_updates(state, tx, grads)
        return new_state, {"discriminator_loss": dis_loss,
                           "dice_loss_fake": fake_loss,
                           "dice_loss": dsc_loss, "final_loss": final}

    return jax.jit(step, donate_argnums=(0,))
