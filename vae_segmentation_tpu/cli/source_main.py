"""Source-domain trainer — the main_source.py equivalent.

Methods (dispatch parity with main_source.py:249-275):
  vae_train          — shape-prior VAE on GT masks
  seg_train          — supervised U-Net (+ optional frozen reference VAE)
  joint_train        — Seg + frozen VAE, recon+dice loss
  domain_adaptation  — cached-pseudo-label variant (epoch-0 teacher preds
                       cached to domain_cache/<prefix>, main_source.py:367-379)
  embed_train        — Encoder+VAE+Fusion latent segmentation
  refine_vae         — VAE decoder refinement (encoder frozen)
  sep_joint_train    — student/teacher Joint distillation

One deliberate fix vs the reference: cached pseudo labels are keyed by
dataset case index, not by batch position (the reference's {idx}_pred.pt
key misaligns with the images once the loader reshuffles,
main_source.py:489-491 + shuffle=True at :237 — a latent bug we do not
reproduce).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.cli import common
from vae_segmentation_tpu.core.config import SourceConfig, parse_source_args
from vae_segmentation_tpu.eval.evaluate import (
    make_embed_eval_step,
    make_joint_eval_step,
    make_seg_eval_step,
    make_vae_eval_step,
)
from vae_segmentation_tpu.models import Embed, Joint, SegUNet, ShapeVAE
from vae_segmentation_tpu.obs.saver import mid_slice_panel
from vae_segmentation_tpu.ops import losses as L
from vae_segmentation_tpu.train import (
    default_sched,
    init_state,
    make_cached_pseudo_adapt_step,
    make_embed_train_step,
    make_joint_train_step,
    make_refine_vae_step,
    make_seg_train_step,
    make_sep_joint_train_step,
    make_vae_train_step,
    optim,
)


# the reference's fixed dict key for every display tensor (label_key,
# main_source.py:115)
LABEL_KEY = "venous_pancreas"


def _build_model(cfg: SourceConfig, n_class: int):
    """Model zoo dispatch (main_source.py:249-275)."""
    m = cfg.method
    bott = common.bottleneck_for(cfg.patch_size)
    if m == "vae_train":
        return ShapeVAE(n_class=n_class, dim=128, soft=cfg.softrelu == 1,
                        bottleneck=bott)
    if m == "seg_train":
        return SegUNet(n_class=n_class)
    if m in ("joint_train", "domain_adaptation", "sep_joint_train"):
        return Joint(n_class=n_class, dim=128, bottleneck=bott)
    if m in ("embed_train", "refine_vae"):
        return Embed(n_class=n_class, dim=128, bottleneck=bott)
    raise ValueError("Try a valid method.")


def _init_params(cfg: SourceConfig, model, n_class: int):
    patch = tuple(cfg.patch_size)
    zero_img = jnp.zeros((1, *patch, 1), jnp.float32)
    zero_onehot = jnp.zeros((1, *patch, n_class), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(cfg.seed)}
    if cfg.method == "vae_train":
        return model.init(rngs, zero_onehot)["params"]
    if cfg.method == "seg_train":
        return model.init(rngs, zero_img)["params"]
    if cfg.method in ("embed_train", "refine_vae"):
        return model.init({**rngs, "reparam": jax.random.PRNGKey(1)},
                          zero_img, zero_onehot)["params"]
    return model.init(rngs, zero_img)["params"]


def _build_optimizer(cfg: SourceConfig, params):
    """SGD(momentum .9) everywhere; joint_train gets the two-group lr
    (Seg: lr_seg, Vae: lr_vae — moot since the VAE is frozen) and the
    frozen-subtree masks of main_source.py:345-357."""
    m = cfg.method
    base = optim.adam(cfg.lr_seg, weight_decay=cfg.weight_decay) if cfg.adam \
        else optim.sgd(cfg.lr_seg, weight_decay=cfg.weight_decay)
    if m in ("joint_train", "domain_adaptation", "sep_joint_train"):
        return optim.freeze_vae(base, params)
    if m == "embed_train":
        return optim.freeze_vae(base, params)  # Encoder toggling is traced
    if m == "refine_vae":
        return optim.freeze_vae_encoder(base, params)
    return base


def _load_params(cfg: SourceConfig, params, ref_vae_params):
    """The selective-load matrix (main_source.py:301-344)."""
    m = cfg.method
    if cfg.load_prefix:
        params = common.load_seg(cfg, params, whole_model=(m == "seg_train"))
    if cfg.load_prefix_vae:
        if m == "seg_train":
            ref_vae_params = common.load_vae(cfg, ref_vae_params,
                                             whole_model=True)
        else:
            params = common.load_vae(cfg, params)
    if cfg.load_prefix_joint:
        params = common.load_joint(cfg, params)
    return params, ref_vae_params


def run(cfg: SourceConfig) -> float:
    np.random.seed(cfg.seed)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    n_class = common.n_classes(cfg)
    mesh = common.make_mesh_if_multichip(cfg)
    runner = common.EpochRunner(cfg)
    m = cfg.method

    print("Loading data.")
    train_loader = common.build_train_loader(
        cfg, mesh, data_root=cfg.data_root, list_key=cfg.train_list,
        pan_index=cfg.pan_index)

    print("Building model.")
    model = _build_model(cfg, n_class)
    params = _init_params(cfg, model, n_class)

    ref_vae = ShapeVAE(n_class=n_class, dim=128,
                       bottleneck=common.bottleneck_for(cfg.patch_size))
    ref_vae_fwd = jax.jit(lambda p, x: ref_vae.apply(
        {"params": p}, x, if_random=False)[0])
    ref_vae_params = None
    if m == "seg_train" and cfg.load_prefix_vae:
        ref_vae_params = _init_params(
            dataclass_replace(cfg, method="vae_train"), ref_vae, n_class)

    teacher_params = None
    if m == "sep_joint_train":
        teacher_params = jax.tree.map(jnp.copy, params)

    print("Loading prefix.")
    params, ref_vae_params = _load_params(cfg, params, ref_vae_params)
    if m == "sep_joint_train":
        # teacher: whole joint, or Seg+Vae assembled from both prefixes
        # (main_source.py:333-341)
        if cfg.load_prefix_joint:
            teacher_params = common.load_joint(cfg, teacher_params)
        else:
            teacher_params = common.load_seg(cfg, teacher_params)
            teacher_params = common.load_vae(cfg, teacher_params)

    tx = _build_optimizer(cfg, params)
    params = common.replicate(mesh, params)
    state = init_state(params, tx)

    # resume: REAL (the reference parses --resume but never implements it)
    start_epoch = 0
    if cfg.resume:
        from vae_segmentation_tpu.core import checkpoint as ckpt_lib
        latest = ckpt_lib.latest_checkpoint(cfg.save_root, cfg.prefix)
        if latest:
            ck = ckpt_lib.load_checkpoint(latest)
            state = init_state(
                ckpt_lib.restore_params(jax.tree.map(np.asarray, state.params), ck), tx)
            start_epoch = ck["epoch"] // cfg.eval_epoch
            runner.best_result = float(
                ck.get("extra", {}).get("best_result", 0.0))
            print(f"Resumed from {latest} at epoch {ck['epoch']} "
                  f"(best {runner.best_result:.4f})")

    # compiled steps
    ingest = common.make_train_ingest(cfg)
    if m == "vae_train":
        # the reference writes a [gt c0, gt c1, recon c1] TB panel from the
        # train batch every display step (main_source.py:394-396,413)
        step = make_vae_train_step(model, tx, n_class, return_display=True)
        eval_step = make_vae_eval_step(model, n_class)
    elif m == "seg_train":
        step = make_seg_train_step(model, tx, n_class)
        eval_step = make_seg_eval_step(model, n_class)
    elif m == "joint_train":
        step = make_joint_train_step(model, tx, n_class)
        eval_step = make_joint_eval_step(model, n_class)
    elif m == "domain_adaptation":
        step = make_cached_pseudo_adapt_step(model, tx, _adapt_cfg(cfg, n_class))
        eval_step = make_joint_eval_step(model, n_class)
    elif m == "embed_train":
        step = make_embed_train_step(model, tx, n_class)
        eval_step = make_embed_eval_step(model, n_class)
    elif m == "refine_vae":
        step = make_refine_vae_step(model, tx, n_class)
        eval_step = make_embed_eval_step(model, n_class)
    elif m == "sep_joint_train":
        step = make_sep_joint_train_step(model, model, tx, n_class)
        eval_step = make_joint_eval_step(model, n_class)
        teacher_params = common.replicate(mesh, teacher_params)

    pseudo_forward = None
    if m == "domain_adaptation":
        pseudo_forward = jax.jit(
            lambda p, img: model.apply({"params": p}, img)[0])

    key = jax.random.PRNGKey(cfg.seed)
    print("Start training")
    for epoch in range(start_epoch, cfg.outer_epochs):
        if not cfg.test_only:
            if epoch == 0 and m == "domain_adaptation":
                _cache_pseudo_labels(cfg, train_loader, pseudo_forward,
                                     state.params, ingest, key)
            sched = _epoch_sched(cfg, epoch)
            for idx, batch in enumerate(train_loader):
                if epoch == 0 and m in ("seg_train", "domain_adaptation"):
                    continue  # epoch-0 skip (main_source.py:416,481)
                key, k_aug, k_step = jax.random.split(key, 3)
                image, label = common.shard_train_batch(mesh, batch)
                image_n, label_a = ingest(image, label, k_aug)
                if m == "vae_train":
                    state, metrics = step(state, label_a, k_step)
                elif m == "seg_train":
                    state, metrics = step(state, image_n, label_a)
                elif m == "joint_train":
                    state, metrics = step(state, image_n, label_a, sched)
                elif m == "domain_adaptation":
                    pseudo = _load_cached_pseudo(cfg, batch["index"], n_class)
                    state, metrics = step(state, image_n, label_a,
                                          jnp.asarray(pseudo), k_step, sched)
                    if cfg.mode != 0 and epoch % cfg.mode == 0:
                        _refresh_pseudo_cache(cfg, batch["index"],
                                              metrics.pop("pred"))
                    else:
                        metrics.pop("pred", None)
                elif m == "embed_train":
                    enc_on = jnp.float32(0.0 if epoch % 2 == 0 else 1.0)
                    state, metrics = step(state, image_n, label_a, k_step,
                                          enc_on)
                elif m == "refine_vae":
                    state, metrics = step(state, image_n, label_a, k_step)
                elif m == "sep_joint_train":
                    state, metrics = step(state, teacher_params, image_n,
                                          label_a)
                train_panel = metrics.pop("display", None)
                _print_train_line(m, epoch, cfg.eval_epoch, idx, metrics)
                runner.saver.write_display(
                    idx + epoch * len(train_loader),
                    [(k, float(v)) for k, v in metrics.items()],
                    {LABEL_KEY + "_display": train_panel}
                    if train_panel is not None else None)

        # ---- validation (main_source.py:685-824)
        print("Start evaluation")
        scores: Dict[int, float] = {}
        display_image: Dict[str, np.ndarray] = {}
        if cfg.eval_mode == "sliding_window" and m != "vae_train":
            dsc, scores = common.run_sliding_window_eval(
                cfg, _seg_apply_fn(cfg, m, model), state.params,
                n_class=n_class, data_root=cfg.val_data_root,
                list_key=cfg.val_list, pan_index=cfg.pan_index)
        else:
            val_loader = common.build_val_loader(
                cfg, data_root=cfg.val_data_root, list_key=cfg.val_list,
                pan_index=cfg.pan_index)
            n_val_cases = max(len(val_loader.dataset), 1)
            # --save_eval_result npy dumps every 10th epoch
            # (main_source.py:721-728,744-761)
            dump = cfg.save_eval_result and epoch % 10 == 0 and \
                m in ("seg_train", "joint_train", "domain_adaptation",
                      "sep_joint_train")
            for pos, batch in enumerate(common.with_image_norm(val_loader)):
                idxs = np.asarray(batch["index"])
                vidx = int(idxs[0])
                label = jnp.asarray(batch["label"])
                # one val panel per epoch, cycling over CASES: the
                # reference's batch-1 loop shows case epoch % n_cases
                # (main_source.py:700-703); with --val_batch > 1 pick that
                # case's sample inside whichever batch holds it — cycling
                # over batch positions would never show some cases
                pj = np.flatnonzero(idxs == epoch % n_val_cases)
                panel_case = cfg.save_more_reference and pj.size > 0
                psel = lambda v: v[int(pj[0]):int(pj[0]) + 1] if pj.size \
                    else v
                if m == "vae_train":
                    recon, score = eval_step(state.params, label)
                    if panel_case:  # main_source.py:700-703
                        onehot = L.one_hot_label(label, n_class)
                        display_image[LABEL_KEY + "_display"] = \
                            mid_slice_panel(psel(onehot)[..., 0],
                                            psel(onehot)[..., 1],
                                            psel(recon)[..., 1])
                else:
                    out = eval_step(state.params, batch["image_norm"], label)
                    if isinstance(out, dict):
                        pred, score = out["pred"], out["score"]
                        recon = out.get("recon")
                    else:
                        pred, score = out
                        recon = None
                    if dump:
                        onehot = L.one_hot_label(label, n_class)
                        pred_b = np.asarray(L.binarize(pred), np.float32)
                        img_b = np.asarray(batch["image_norm"], np.float32)
                        gt_b = np.asarray(L.binarize(onehot), np.float32)
                        for j, vi in enumerate(idxs):
                            common.save_eval_npys(
                                cfg.result_path, epoch, int(vi),
                                pred_b[j:j + 1], img_b[j:j + 1],
                                gt_b[j:j + 1])
                        if m == "seg_train" and ref_vae_params is not None:
                            gt_recon = np.moveaxis(np.asarray(
                                L.binarize(ref_vae_fwd(ref_vae_params,
                                                       onehot)),
                                np.float32), -1, 1)
                            for j, vi in enumerate(idxs):
                                np.save(os.path.join(
                                    cfg.result_path,
                                    f"{epoch}_{int(vi)}_gt_recon"),
                                    gt_recon[j:j + 1])
                    if panel_case:
                        onehot = L.one_hot_label(label, n_class)
                        if recon is not None:  # joint family, :744-753
                            display_image[LABEL_KEY + "_display_val"] = \
                                mid_slice_panel(psel(recon)[..., 1],
                                                psel(onehot)[..., 1],
                                                psel(pred)[..., 1])
                        elif m == "seg_train" and ref_vae_params is not None:
                            # :762-769
                            recon_pred = ref_vae_fwd(ref_vae_params, pred)
                            display_image[LABEL_KEY + "_display_val"] = \
                                mid_slice_panel(
                                    psel(jnp.asarray(batch["image_norm"])),
                                    psel(onehot)[..., 1], psel(pred)[..., 1],
                                    psel(recon_pred)[..., 1])
                score = np.asarray(score).reshape(-1)
                for j, vi in enumerate(idxs):
                    scores[int(vi)] = float(score[j])
            dsc = sum(scores.values()) / max(len(scores), 1)
        # post-eval train-batch panel (main_source.py:776-811)
        if cfg.save_more_reference and not cfg.test_only and \
                m not in ("vae_train", "embed_train", "refine_vae"):
            panel = _train_display_panel(cfg, m, eval_step, state.params,
                                         epoch, n_class, ref_vae_fwd,
                                         ref_vae_params)
            if panel is not None:
                display_image[LABEL_KEY + "_display_train"] = panel
        runner.dump_scores(epoch, scores)
        runner.saver.write_display(
            (epoch + 1) * len(train_loader), [("val_result", dsc)],
            display_image or None, force_write=True)
        runner.end_of_epoch(epoch, dsc, state.params, state.opt_state)
        if cfg.test_only:
            break
    runner.saver.close()
    return runner.best_result


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def dataclass_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def _seg_apply_fn(cfg, method, model):
    """(params, images[B,*patch,1]) -> probs — the patch-level inference fn
    handed to the sliding-window evaluator."""
    if method == "seg_train":
        return lambda p, x: model.apply({"params": p}, x)
    if method in ("joint_train", "domain_adaptation", "sep_joint_train"):
        return lambda p, x: model.apply({"params": p}, x,
                                        method=Joint.segment)
    if method in ("embed_train", "refine_vae"):
        return lambda p, x: model.apply({"params": p}, x,
                                        method=Embed.segment)
    raise ValueError(method)


def _train_display_panel(cfg, m, eval_step, params, epoch, n_class,
                         ref_vae_fwd, ref_vae_params):
    """Post-eval TB panel of one train case (main_source.py:776-811): the
    reference iterates a second train loader and keeps batch epoch%len; we
    index the case directly. Deviation (documented): the case goes through
    the val normalization (no random warp) — the reference pushes it through
    the train augmentation chain."""
    from vae_segmentation_tpu.data.manifest import filedict_from_json
    from vae_segmentation_tpu.data.pipeline import CaseDataset
    from vae_segmentation_tpu.data.transforms import parse_pan_index

    entries = filedict_from_json(cfg.data_path, cfg.train_list, 1)
    ds = CaseDataset(entries, cfg.data_root,
                     mask_index=parse_pan_index(cfg.pan_index),
                     output_size=cfg.patch_size)
    case = ds[epoch % len(ds)]
    image_n = common._val_ingest(jnp.asarray(case["image"])[None])
    label = jnp.asarray(case["label"])[None]
    out = eval_step(params, image_n, label)
    onehot = L.one_hot_label(label, n_class)
    if isinstance(out, dict) and out.get("recon") is not None:
        # joint family: [recon_pred c1, gt c1, pred c1] (:785-789)
        return mid_slice_panel(out["recon"][..., 1], onehot[..., 1],
                               out["pred"][..., 1])
    pred = out["pred"] if isinstance(out, dict) else out[0]
    vols = [image_n, onehot[..., 1], pred[..., 1]]
    if ref_vae_params is not None:  # seg_train + ref VAE (:795-805)
        vols.append(ref_vae_fwd(ref_vae_params, pred)[..., 1])
    return mid_slice_panel(*vols)


def _adapt_cfg(cfg: SourceConfig, n_class: int):
    from vae_segmentation_tpu.train import AdaptConfig
    return AdaptConfig(n_class=n_class,
                       turn_enabled=cfg.turn_epoch != -1)


def _epoch_sched(cfg: SourceConfig, epoch: int):
    sched = default_sched(cfg.lambda_vae)
    if cfg.lambda_vae_warmup > 0:
        sched["warmup_scale"] = jnp.float32(
            1.0 if epoch >= cfg.lambda_vae_warmup
            else epoch / cfg.lambda_vae_warmup)
    if cfg.turn_epoch != -1:
        sched["turn_phase"] = jnp.int32((epoch // cfg.turn_epoch) % 2)
    return sched


def _pseudo_path(cfg, case_index: int) -> str:
    return os.path.join(cfg.middle_path, f"{case_index}_pred.npy")


def _cache_pseudo_labels(cfg, train_loader, forward, params, ingest, key):
    """Epoch-0 teacher-prediction cache (main_source.py:367-379), keyed by
    dataset case index (deliberate fix, see module docstring)."""
    os.makedirs(cfg.middle_path, exist_ok=True)
    seen = set()
    for batch in train_loader:
        image_n = common._val_ingest(jnp.asarray(batch["image"]))
        pred = np.asarray(forward(params, image_n[..., None]))
        for i, case_idx in enumerate(np.asarray(batch["index"])):
            ci = int(case_idx)
            if ci in seen:
                continue
            seen.add(ci)
            np.save(_pseudo_path(cfg, ci), pred[i].astype(np.float32))


def _load_cached_pseudo(cfg, indices, n_class) -> np.ndarray:
    return np.stack([np.load(_pseudo_path(cfg, int(i))) for i in indices])


def _refresh_pseudo_cache(cfg, indices, preds) -> None:
    preds = np.asarray(preds)
    for i, case_idx in enumerate(np.asarray(indices)):
        np.save(_pseudo_path(cfg, int(case_idx)), preds[i].astype(np.float32))


_PRINT_KEYS = {
    "vae_train": ("dice_loss", "kl_loss"),
    "seg_train": ("dice_loss",),
    "joint_train": ("recon_loss", "dice_loss"),
    "domain_adaptation": ("recon_loss", "dice_loss_fake", "dice_loss"),
    "embed_train": ("dice_loss1", "dice_loss2", "mse_loss", "inpaint_loss",
                    "recon_loss"),
    "refine_vae": ("recon_loss", "inpaint_loss", "init_loss"),
    "sep_joint_train": ("recon_loss", "dice_loss"),
}


def _print_train_line(method, epoch, eval_epoch, idx, metrics):
    keys = _PRINT_KEYS.get(method, ())
    vals = ", ".join("%.4f" % float(metrics[k]) for k in keys if k in metrics)
    print("[%3d, %3d] loss: %s" % ((epoch + 1) * eval_epoch, idx + 1, vals))


def main(argv=None):
    run(parse_source_args(argv))


if __name__ == "__main__":
    main()
