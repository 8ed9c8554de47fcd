"""Validation — jitted whole-crop inference + on-device Dice.

Mirrors the reference eval loops:
  * vae_train eval: recon of the GT one-hot, binary dice over classes [1:n)
    (main_source.py:692-707)
  * seg/joint/domain eval: pred vs GT one-hot, binary dice, one 128^3 ROI
    crop per case (main_source.py:709-774, main_target.py:796-995)

Every eval step returns PER-SAMPLE scores ([B]), so --val_batch > 1
processes several cases per compiled call while preserving the per-case
score_{epoch}.json contract exactly (the reference's batch-1 loop is the
val_batch=1 special case; main_source.py:812-814).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.ops import losses as L


def make_vae_eval_step(model, n_class: int):
    @jax.jit
    def step(params, label):
        onehot = L.one_hot_label(label, n_class)
        recon, _, _ = model.apply({"params": params}, onehot, if_random=False)
        score = L.avg_dsc(recon, onehot, binary=True, botindex=1,
                          topindex=n_class, return_mean=False)
        return recon, score

    return step


def make_seg_eval_step(model, n_class: int):
    @jax.jit
    def step(params, image, label):
        onehot = L.one_hot_label(label, n_class)
        pred = model.apply({"params": params}, image[..., None])
        score = L.avg_dsc(pred, onehot, binary=True, botindex=1,
                          topindex=n_class, return_mean=False)
        return pred, score

    return step


def make_joint_eval_step(model, n_class: int, *, with_gt_recon: bool = False):
    """Joint eval forward (main_target.py:913-914). with_gt_recon also runs
    the VAE on the GT one-hot ('_only_recon', used by ft1/analysis paths)."""

    @jax.jit
    def step(params, image, label):
        onehot = L.one_hot_label(label, n_class)
        pred, recon, _, _ = model.apply({"params": params}, image[..., None])
        score = L.avg_dsc(pred, onehot, binary=True, botindex=1,
                          topindex=n_class, return_mean=False)
        out = {"pred": pred, "recon": recon, "score": score}
        if with_gt_recon:
            gt_recon, _, _ = model.apply(
                {"params": params}, onehot,
                method=lambda m, x: m.vae_forward(x, False, 0.0, False, 0.0))
            out["gt_recon"] = gt_recon
        return out

    return step


def make_embed_eval_step(model, n_class: int):
    """Embed/refine_vae eval forward: Fusion pred in test_mode
    (main_source.py:742-743), binary dice vs GT. The gt_recon branch samples
    the latent; eval uses a fixed key for determinism."""

    @jax.jit
    def step(params, image, label):
        onehot = L.one_hot_label(label, n_class)
        out = model.apply({"params": params}, image[..., None], onehot,
                          test_mode=True,
                          rngs={"reparam": jax.random.PRNGKey(0)})
        score = L.avg_dsc(out["pred"], onehot, binary=True, botindex=1,
                          topindex=n_class, return_mean=False)
        return {"pred": out["pred"], "score": score}

    return step


def make_analysis_metrics_step(model, teacher, n_class: int):
    """The --analysis_figure_name metric set (main_target.py:956-976):
    pseudo-loss / recon-loss pairs for the student pred, the GT, and the
    teacher's pseudo label."""

    @jax.jit
    def step(params, teacher_params, image, label):
        img = image[..., None]
        onehot = L.one_hot_label(label, n_class)
        pred, recon, _, _ = model.apply({"params": params}, img)
        gt_recon, _, _ = model.apply(
            {"params": params}, onehot,
            method=lambda m, x: m.vae_forward(x, False, 0.0, False, 0.0))
        fake, fake_recon, _, _ = teacher.apply({"params": teacher_params}, img)
        n = n_class
        kw = dict(botindex=1, topindex=n, return_mean=False)
        return {
            "score": L.avg_dsc(pred, onehot, binary=True, **kw),
            "gt_recon_loss": 1 - L.avg_dsc(gt_recon, onehot, binary=True, **kw),
            "gt_dsc_loss_fake": 1 - L.avg_dsc(fake, onehot, **kw),
            "recon_loss": 1 - L.avg_dsc(pred, recon, binary=True, **kw),
            "dsc_loss_fake": 1 - L.avg_dsc(pred, fake, **kw),
            "pseudo_recon_loss": 1 - L.avg_dsc(fake, fake_recon, **kw),
            "pseudo_dsc_loss_fake": 1 - L.avg_dsc(fake, fake, **kw),
        }

    return step


def run_eval(loader, eval_step: Callable, params, *,
             uses_image: bool = True) -> Tuple[float, Dict[int, float]]:
    """Per-case eval loop: mean dice + per-case score dict
    (main_source.py:690-707)."""
    import numpy as np

    scores: Dict[int, float] = {}
    for batch in loader:
        if uses_image:
            out = eval_step(params, batch["image_norm"], batch["label"])
            score = out["score"] if isinstance(out, dict) else out[1]
        else:
            _, score = eval_step(params, batch["label"])
        score = np.asarray(score).reshape(-1)
        for j, vi in enumerate(np.asarray(batch["index"])):
            scores[int(vi)] = float(score[j])
    mean = sum(scores.values()) / max(len(scores), 1)
    return mean, scores
