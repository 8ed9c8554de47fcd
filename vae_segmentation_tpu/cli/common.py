"""Shared trainer machinery for the source/target CLIs.

Covers what the two reference mains duplicate between themselves: pipeline
construction (main_source.py:189-243, main_target.py:200-310), the selective
checkpoint-load matrix (main_source.py:301-344, main_target.py:355-394),
score-JSON dumps (main_source.py:812-814), and checkpoint save cadence
(main_source.py:826-850) — rebuilt around a device mesh + jitted ingest
instead of worker processes and .cuda() calls.
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vae_segmentation_tpu import parallel
from vae_segmentation_tpu.core import checkpoint as ckpt_lib
from vae_segmentation_tpu.core.config import CommonConfig
from vae_segmentation_tpu.data import augment
from vae_segmentation_tpu.data.manifest import filedict_from_json
from vae_segmentation_tpu.data.pipeline import CaseDataset, Loader
from vae_segmentation_tpu.data.transforms import parse_pan_index
from vae_segmentation_tpu.obs.saver import Saver


# --------------------------------------------------------------------------
# data
# --------------------------------------------------------------------------

def build_train_loader(cfg: CommonConfig, mesh, *, data_root: str,
                       list_key: str, pan_index: str,
                       replicate: bool = True, seed_salt: int = 0) -> Loader:
    """Train loader with the reference's list-replication trick: the file
    list is repeated eval_epoch x so one loader pass == eval_epoch dataset
    epochs (main_source.py:123-131,186)."""
    entries = filedict_from_json(cfg.data_path, list_key,
                                 cfg.eval_epoch if replicate else 1)
    ds = CaseDataset(entries, data_root,
                     mask_index=parse_pan_index(pan_index),
                     output_size=cfg.patch_size,
                     shift=getattr(cfg, "shift", 0))
    if getattr(cfg, "aug_host", False) and not cfg.no_aug:
        from vae_segmentation_tpu.data.pipeline import AugmentedDataset
        ds = AugmentedDataset(ds, cfg.patch_size,
                              order=getattr(cfg, "aug_order", 1),
                              seed=cfg.seed + seed_salt)
    sharding = parallel.batch_sharding(
        mesh, shard_spatial=mesh.shape[parallel.SPATIAL_AXIS] > 1) \
        if mesh is not None else None
    return Loader(ds, cfg.batch_size, shuffle=True, drop_last=True,
                  num_workers=cfg.num_workers, seed=cfg.seed + seed_salt,
                  device_sharding=sharding)


def build_val_loader(cfg: CommonConfig, *, data_root: str, list_key: str,
                     pan_index: str) -> Loader:
    entries = filedict_from_json(cfg.data_path, list_key, 1)
    ds = CaseDataset(entries, data_root,
                     mask_index=parse_pan_index(pan_index),
                     output_size=cfg.patch_size)
    return Loader(ds, cfg.val_batch, shuffle=False, drop_last=False,
                  num_workers=cfg.num_workers, seed=cfg.seed)


def n_classes(cfg: CommonConfig) -> int:
    return len(parse_pan_index(cfg.pan_index))


def bottleneck_for(patch_size, top_fmaps: int = 256) -> int:
    """Flattened VAE bottleneck width: fmaps[-1] * prod(patch/32)
    (16384 at the reference's 128^3, joint_model.py:222)."""
    n = top_fmaps
    for p in patch_size:
        n *= p // 32
    return n


# --------------------------------------------------------------------------
# device-side ingest
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("patch_size", "no_aug", "aug_order",
                                   "fold"))
def _train_ingest(image, label, key, patch_size, no_aug, aug_order=1,
                  fold=0):
    if not no_aug:
        image, label = augment.spatial_augment(image, label, key,
                                               patch_size=patch_size,
                                               order=aug_order)
    image = augment.intensity_normalize(image)
    if fold:
        # Emit the space-to-depth rep directly (fold=1 plain, fold=2
        # W-PACKED): inside this jit the fold reorg fuses with the
        # augmentation gather's output indexing, instead of running as a
        # standalone step-entry copy (~4.3 ms/step in the round-3 trace).
        # The train steps and entry convs detect the prefolded rep by
        # shape (train/steps._folded_onehot, models/blocks.Conv3).
        from vae_segmentation_tpu.ops import s2d

        image = s2d.fold_rep(image[..., None], fold == 2)
        label = s2d.fold_rep(label.astype(jnp.bfloat16)[..., None],
                             fold == 2)
    return image, label


@jax.jit
def _val_ingest(image):
    return augment.intensity_normalize(image)


def make_train_ingest(cfg: CommonConfig, fold: int = 0) -> Callable:
    """(image, label, key) -> (image_norm, label), jit-compiled: random
    affine warp (unless --no_aug) + clip/center normalization — the
    device-side replacement of MySpatialTransform + Clip + CenterIntensities
    (main_source.py:197-212).

    fold: 0 raw, 1/2 emit the (W-packed) space-to-depth rep for steps on
    the folded pipeline — must match the model's rep
    (models.blocks.stage_wpack)."""
    patch = tuple(cfg.patch_size)
    aug_order = getattr(cfg, "aug_order", 1)
    # --aug_host: the warp already happened in the loader workers
    # (data/pipeline.AugmentedDataset); the device ingest only
    # normalizes + folds.
    no_aug = cfg.no_aug or getattr(cfg, "aug_host", False)

    # One jit over the WHOLE ingest: without it only the inner
    # spatial_augment is compiled and the normalize + fold tail runs
    # eagerly — each op its own dispatch and HBM round trip, and the fold
    # reorg a standalone copy instead of fusing with the warp gather's
    # output indexing (the round-3 prefolded-ingest win assumed this).
    @jax.jit
    def ingest(image, label, key):
        return _train_ingest(image, label, key, patch, no_aug,
                             aug_order, fold)

    return ingest


def with_image_norm(loader) -> Iterator[Dict]:
    """Wrap a val loader: adds 'image_norm' (device, normalized)."""
    for batch in loader:
        batch = dict(batch)
        batch["image_norm"] = _val_ingest(jnp.asarray(batch["image"]))
        yield batch


# --------------------------------------------------------------------------
# checkpoint load matrix
# --------------------------------------------------------------------------

def _load(cfg: CommonConfig, prefix: str, name: Optional[str] = None) -> Dict:
    path = ckpt_lib.checkpoint_path(cfg.save_root, prefix,
                                    name or "best_model.ckpt")
    print(f"Loading checkpoint {path}")
    return ckpt_lib.load_checkpoint(path)


def load_seg(cfg, params, *, whole_model: bool = False):
    """--load_prefix: Seg weights (whole model for seg_train,
    main_source.py:303-308)."""
    ck = _load(cfg, cfg.load_prefix, cfg.checkpoint_name)
    return ckpt_lib.load_component(params, ck,
                                   None if whole_model else "Seg")


def load_vae(cfg, params, *, whole_model: bool = False):
    ck = _load(cfg, cfg.load_prefix_vae)
    return ckpt_lib.load_component(params, ck,
                                   None if whole_model else "Vae")


def load_encoder(cfg, params, *, whole_model: bool = False):
    ck = _load(cfg, cfg.load_prefix_encoder)
    return ckpt_lib.load_component(params, ck,
                                   None if whole_model else "Dis")


def load_joint(cfg, params):
    ck = _load(cfg, cfg.load_prefix_joint)
    return ckpt_lib.load_component(params, ck, None)


# --------------------------------------------------------------------------
# epoch-level bookkeeping
# --------------------------------------------------------------------------

class EpochRunner:
    """Save/best/score bookkeeping shared by both trainers
    (main_source.py:806-850; main_target.py:1022-1062)."""

    def __init__(self, cfg: CommonConfig):
        self.cfg = cfg
        self.best_result = 0.0
        os.makedirs(cfg.save_path, exist_ok=True)
        os.makedirs(cfg.display_path, exist_ok=True)
        self.saver = Saver(cfg.display_path, display_freq=10)

    def dump_scores(self, epoch: int, scores: Dict[int, float],
                    name: str = "score") -> None:
        path = os.path.join(self.cfg.display_path, f"{name}_{epoch}.json")
        with open(path, "w") as f:
            json.dump({str(k): v for k, v in scores.items()}, f)

    def end_of_epoch(self, epoch: int, dsc: float, params, opt_state,
                     *, extra: Optional[Dict] = None) -> bool:
        """Best-checkpoint + periodic save; returns True if improved."""
        cfg = self.cfg
        print("epoch %d validation result: %f, best result %f."
              % (epoch + 1, dsc, self.best_result))
        improved = dsc > self.best_result
        extra = dict(extra or {})
        if improved and not cfg.test_only:
            self.best_result = dsc
        extra["best_result"] = self.best_result
        if improved and not cfg.test_only:
            ckpt_lib.save_checkpoint(
                os.path.join(cfg.save_path, "best_model.ckpt"),
                epoch=(epoch + 1) * cfg.eval_epoch, params=params,
                opt_state=opt_state, extra=extra)
        if not cfg.test_only and \
                (epoch + 1) % (cfg.save_epoch // cfg.eval_epoch) == 0:
            print("saving model")
            ckpt_lib.save_checkpoint(
                os.path.join(
                    cfg.save_path,
                    f"model_epoch{(epoch + 1) * cfg.eval_epoch}.ckpt"),
                epoch=(epoch + 1) * cfg.eval_epoch, params=params,
                opt_state=opt_state, extra=extra)
        return improved


def make_mesh_if_multichip(cfg: CommonConfig):
    """('data', 'spatial') mesh sized to the run: the data axis is the
    largest divisor of batch_size that fits the chips left after
    --spatial_shards. None when that degenerates to a single device —
    everything runs unsharded.

    When --spatial_shards is left at 1 and chips would sit idle (e.g. the
    flagship batch 4 on a v5e-8), the idle pairs are auto-promoted to the
    'spatial' axis — D-axis sharding with XLA halo exchange — so the whole
    slice works (DP4 x SP2 instead of 4 idle chips)."""
    n_dev = jax.device_count()
    n_spatial = cfg.spatial_shards
    avail = n_dev // n_spatial
    n_data = 1
    for d in range(min(avail, cfg.batch_size), 0, -1):
        if cfg.batch_size % d == 0:
            n_data = d
            break
    if n_spatial == 1 and n_data > 1 and n_data * 2 <= n_dev \
            and cfg.patch_size[0] % 8 == 0:
        n_spatial = 2
        print(f"Auto-promoting {n_dev - n_data} idle chips to spatial "
              f"sharding: mesh data={n_data} x spatial={n_spatial}")
    if n_data * n_spatial < n_dev:
        print(f"WARNING: using {n_data * n_spatial} of {n_dev} devices "
              f"(batch_size={cfg.batch_size}, "
              f"spatial_shards={cfg.spatial_shards}); raise the batch or "
              f"--spatial_shards to occupy the slice")
    if n_data == 1 and n_spatial == 1:
        return None
    from vae_segmentation_tpu.models.blocks import set_stencil_mesh

    mesh = parallel.make_mesh(n_data=n_data, n_spatial=n_spatial)
    # The Pallas stencil convs stay live per shard via shard_map under BOTH
    # mesh shapes: DP-only splits the batch dim (the pallas grid's leading
    # dim — exact as-is); spatial meshes also split the D axis and the wrap
    # exchanges the +-1 depth halo planes with lax.ppermute before each
    # kernel (blocks.stencil_shard_wrap). Round 2 disabled the stencil
    # under spatial meshes, which made the flagship DP4xSP2 mesh run the
    # ~3.6x slower XLA folded path (BENCH.md round-3 policy table).
    set_stencil_mesh(mesh)
    return mesh


def shard_train_batch(mesh, batch):
    if mesh is None:
        return jnp.asarray(batch["image"]), jnp.asarray(batch["label"])
    sh = parallel.batch_sharding(
        mesh, shard_spatial=mesh.shape[parallel.SPATIAL_AXIS] > 1)
    return (jax.device_put(batch["image"], sh),
            jax.device_put(batch["label"], sh))


def replicate(mesh, tree):
    return tree if mesh is None else parallel.replicate_params(mesh, tree)


class FullVolumeDataset:
    """Uncropped cases for sliding-window eval: full image + remapped label
    at native (resampled) resolution."""

    def __init__(self, entries, root_dir, mask_index=None):
        from vae_segmentation_tpu.data.transforms import load_merge_case
        self._load = load_merge_case
        self.entries = list(entries)
        self.root_dir = root_dir
        self.mask_index = mask_index

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx):
        case = self._load(self.root_dir, self.entries[idx], self.mask_index)
        return {"image": case["image"], "label": case["label"],
                "id": case["id"], "index": idx}


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def run_sliding_window_eval(cfg, seg_apply, params, *, n_class: int,
                            data_root: str, list_key: str, pan_index: str,
                            params_for_case: Optional[Callable] = None
                            ) -> Tuple[float, Dict[int, float]]:
    """Full-volume sliding-window eval (framework extension; the on-device
    generalization of the legacy predict_vol, utils/utils.py:742-803).

    Volumes are padded up to multiples of 64 per axis so XLA compiles a
    bounded set of stitching programs instead of one per case shape.
    Scores are keyed by the case's dataset index — the SAME key the crop
    path uses (batch['index']), so score_{epoch}.json is directly
    comparable between the two eval modes.

    params_for_case: optional callable(case_dict) -> params giving each
    case its own parameters — the ft1 test-time-training hook
    (main_target.py:807-900 composed with the full-volume sweep).
    """
    from vae_segmentation_tpu.data.manifest import filedict_from_json
    from vae_segmentation_tpu.data.transforms import parse_pan_index
    from vae_segmentation_tpu.eval.sliding_window import sliding_window_predict
    from vae_segmentation_tpu.ops import losses as L

    entries = filedict_from_json(cfg.data_path, list_key, 1)
    ds = FullVolumeDataset(entries, data_root, parse_pan_index(pan_index))
    patch = tuple(cfg.patch_size)
    scores: Dict[int, float] = {}
    for idx in range(len(ds)):
        case = ds[idx]
        p = params if params_for_case is None else params_for_case(case)
        img = case["image"].astype(np.float32)
        lab = case["label"]
        shape = img.shape
        padded = [_round_up(max(s, p_), 64) for s, p_ in zip(shape, patch)]
        img = np.pad(img, [(0, t - s) for s, t in zip(shape, padded)],
                     constant_values=-1024.0)
        img_n = _val_ingest(jnp.asarray(img))
        probs = sliding_window_predict(
            seg_apply, p, img_n, patch=patch, overlap=cfg.sw_overlap,
            batch=min(cfg.batch_size, 4), n_class=n_class)
        probs = probs[: shape[0], : shape[1], : shape[2]]
        pred = jnp.argmax(probs, axis=-1).astype(jnp.float32)
        if getattr(cfg, "postprocess", False):
            # the reference's full-volume predict_vol rule
            # (utils/utils.py:777-796): keep the <=2 largest foreground
            # components above the voxel floor, zero the rest. Host-side
            # scipy CC on the argmax map — offline tooling, not the hot
            # loop (SURVEY.md section 2.3).
            from vae_segmentation_tpu.eval.postprocess import \
                largest_components
            pred_np = np.asarray(pred)
            keep = largest_components(
                pred_np > 0, min_voxels=cfg.postprocess_min_voxels)
            pred = jnp.asarray(pred_np * keep, jnp.float32)
        onehot_pred = jax.nn.one_hot(pred, n_class)[None]
        onehot_gt = jax.nn.one_hot(jnp.asarray(lab, jnp.int32), n_class)[None]
        score = L.avg_dsc(onehot_pred, onehot_gt, botindex=1,
                          topindex=n_class)
        scores[int(case["index"])] = float(score)
    mean = sum(scores.values()) / max(len(scores), 1)
    return mean, scores


def save_eval_npys(result_path: str, epoch: int, val_idx: int,
                   pred_bin: np.ndarray, image: np.ndarray,
                   gt_bin: np.ndarray) -> None:
    """--save_eval_result npy dumps (main_target.py:922-936). Keeps the
    reference's channel-first layout for drop-in compatibility with its
    analysis tooling."""
    os.makedirs(result_path, exist_ok=True)
    np.save(os.path.join(result_path, f"{epoch}_{val_idx}_pred.join"),
            np.moveaxis(pred_bin, -1, 1))
    np.save(os.path.join(result_path, f"{epoch}_{val_idx}_pic"),
            image[:, None])
    np.save(os.path.join(result_path, f"{epoch}_{val_idx}_gt"),
            np.moveaxis(gt_bin, -1, 1))
