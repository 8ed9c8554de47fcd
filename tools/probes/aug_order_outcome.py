"""Probe: does the order-1 (trilinear) augmentation default change the
TRAINING OUTCOME vs the reference's order-3 cubic image interpolation
(batchgenerators order_data=3, /root/reference/utils/utils.py:952-964)?

Two seg_train runs in THIS framework, identical in every respect — same
init weights, same case pool, same batch/augmentation key sequence, same
optimizer — except the image interpolation order of the spatial warp
(labels are order-0 in both, exactly like the reference). Trains on
synthetic CT phantoms (data/synthetic.py intensity model) with the full
device-side ingest (_train_ingest: spatial_augment + intensity_normalize),
evaluates on clean un-augmented center crops.

Output: val-dice trajectory per arm + plateau delta — the
decision number for the recipe-facing --aug_order default (round-3
verdict Missing #3 / round-4 item 4). The step-rate side is
tools/probes/aug_order_time.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from vae_segmentation_tpu.cli.common import _train_ingest, _val_ingest  # noqa: E402

_train_ingest = jax.jit(_train_ingest, static_argnums=(3, 4, 5, 6))
from vae_segmentation_tpu.data.synthetic import make_phantom  # noqa: E402
from vae_segmentation_tpu.models import SegUNet  # noqa: E402
from vae_segmentation_tpu.train import (init_state,  # noqa: E402
                                        make_seg_train_step, optim)

SRC, PATCH, B = 48, (32, 32, 32), 2
N_STEPS, EVAL_EVERY = 240, 24
LR = 3e-2
N_TRAIN_CASES, N_VAL_CASES = 8, 6


def _binary_dice(pred_fg, gt_fg):
    inter = float(np.sum(pred_fg * gt_fg))
    return 2.0 * inter / (float(np.sum(pred_fg) + np.sum(gt_fg)) + 1e-6)


def _cases(seed, n):
    rng = np.random.default_rng(seed)
    out = [make_phantom(rng, SRC) for _ in range(n)]
    return (np.stack([c["image"] for c in out]).astype(np.float32),
            np.stack([c["label"] for c in out]).astype(np.float32))


def run_arm(order: int, params0, train_imgs, train_labs, val_x, val_fg):
    model = SegUNet(n_class=2, dtype=jnp.float32, remat=False)
    tx = optim.sgd(LR)
    step = make_seg_train_step(model, tx, 2)
    state = init_state(jax.tree.map(jnp.copy, params0), tx)
    apply = jax.jit(lambda p, x: model.apply({"params": p}, x))

    def val_dice(p):
        pred = np.asarray(apply(p, val_x))
        pred_fg = (np.argmax(pred, axis=-1) == 1).astype(np.float32)
        return float(np.mean([_binary_dice(pred_fg[i], val_fg[i])
                              for i in range(val_fg.shape[0])]))

    base = jax.random.PRNGKey(7)
    traj = []
    t0 = time.time()
    for i in range(N_STEPS):
        sel = np.arange(i * B, (i + 1) * B) % train_imgs.shape[0]
        img = jnp.asarray(train_imgs[sel])
        lab = jnp.asarray(train_labs[sel])
        # SAME key sequence for both arms: the warp geometry is identical,
        # only the image interpolation differs
        img_n, lab_w = _train_ingest(img, lab, jax.random.fold_in(base, i),
                                     PATCH, False, order, 0)
        state, aux = step(state, img_n, lab_w)
        if (i + 1) % EVAL_EVERY == 0:
            traj.append(val_dice(state.params))
            print(f"  order{order} step {i + 1:4d}  "
                  f"loss {float(aux['dice_loss']):.4f}  "
                  f"val_dice {traj[-1]:.4f}", flush=True)
    print(f"  order{order} wall {time.time() - t0:.0f}s", flush=True)
    return traj


def main():
    train_imgs, train_labs = _cases(0, N_TRAIN_CASES)
    val_imgs, val_labs = _cases(99, N_VAL_CASES)
    lo = (SRC - PATCH[0]) // 2
    sl = slice(lo, lo + PATCH[0])
    val_x = _val_ingest(jnp.asarray(val_imgs[:, sl, sl, sl]))[..., None]
    val_fg = (val_labs[:, sl, sl, sl] > 0).astype(np.float32)

    model = SegUNet(n_class=2, dtype=jnp.float32, remat=False)
    params0 = model.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1,) + PATCH + (1,)))["params"]

    t1 = run_arm(1, params0, train_imgs, train_labs, val_x, val_fg)
    t3 = run_arm(3, params0, train_imgs, train_labs, val_x, val_fg)
    p1, p3 = np.mean(t1[-3:]), np.mean(t3[-3:])
    print(f"order1 traj: {[round(v, 4) for v in t1]}")
    print(f"order3 traj: {[round(v, 4) for v in t3]}")
    print(f"plateau order1 {p1:.4f}  order3 {p3:.4f}  "
          f"delta {p3 - p1:+.4f}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
