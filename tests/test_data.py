"""Data pipeline tests: manifest contract, CropResize geometry, resize
semantics, the threaded loader, and the on-device augmentation/ingest."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.data import augment
from vae_segmentation_tpu.data.manifest import case_id, filedict_from_json
from vae_segmentation_tpu.data.pipeline import CaseDataset, Loader
from vae_segmentation_tpu.data.resize import resize_volume
from vae_segmentation_tpu.data.synthetic import write_synthetic_dataset
from vae_segmentation_tpu.data.transforms import (
    crop_resize,
    load_merge_case,
    parse_pan_index,
    remap_labels,
)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    manifest = write_synthetic_dataset(root, n_train=4, n_val=2, size=64)
    return root, manifest


def test_manifest_replication(synth):
    root, manifest = synth
    base = filedict_from_json(manifest, "NIH_train", 1)
    rep = filedict_from_json(manifest, "NIH_train", 3)
    assert len(rep) == 3 * len(base)
    assert rep[: len(base)] == base
    assert filedict_from_json(manifest, "missing_key") == []


def test_case_id():
    assert case_id("PANCREAS_0042/merge.npy") == "0042"


def test_parse_pan_index():
    # main_source.py:92-95
    assert parse_pan_index("1") == [[0, 0], [1, 1]]
    assert parse_pan_index("10") == [[0, 0], [[1, 2], 1]]
    assert parse_pan_index("11") == [[0, 0], [11, 1]]
    assert parse_pan_index("1,2") == [[0, 0], [1, 1], [2, 2]]


def test_remap_labels_msd_merge():
    raw = np.array([0, 1, 2, 3], dtype=np.int16)
    out = remap_labels(raw, parse_pan_index("10"))
    np.testing.assert_array_equal(out, [0, 1, 1, 0])


def test_load_merge_case(synth):
    root, manifest = synth
    entry = filedict_from_json(manifest, "NIH_train")[0]
    case = load_merge_case(root, entry, parse_pan_index("1"))
    assert case["image"].shape == (64, 64, 64)
    assert set(np.unique(case["label"])) <= {0.0, 1.0}


def test_crop_resize_contract(synth):
    root, manifest = synth
    entry = filedict_from_json(manifest, "NIH_train")[0]
    case = load_merge_case(root, entry, parse_pan_index("1"))
    out = crop_resize(case["image"], case["label"], (32, 32, 32))
    assert out["image"].shape == (32, 32, 32)
    assert out["label"].shape == (32, 32, 32)
    assert set(np.unique(out["label"])) <= {0.0, 1.0}
    # the crop is centered on the organ: foreground survives the crop and
    # fills a substantial fraction (cube side = max bbox extent * 1.2)
    assert out["label"].mean() > 0.05
    assert out["ori_shape"].shape == (6,)
    assert list(out["ori_shape"][:3]) == [64, 64, 64]


def test_crop_resize_empty_mask_fallback():
    img = np.zeros((128, 128, 128), np.float32)
    lab = np.zeros((128, 128, 128), np.float32)
    out = crop_resize(img, lab, (32, 32, 32))  # utils/utils.py:264-267
    assert out["image"].shape == (32, 32, 32)
    # fallback crop: center (64,64,64), L=32 (+10% pad)
    assert list(out["ori_shape"][3:]) == [38, 38, 38]


def test_resize_volume_identity_and_labels(rng):
    vol = rng.random((16, 16, 16)).astype(np.float32)
    np.testing.assert_array_equal(resize_volume(vol, (16, 16, 16)), vol)
    lab = (rng.random((16, 16, 16)) > 0.5).astype(np.float32) * 3
    out = resize_volume(lab, (24, 24, 24), order=0)
    assert set(np.unique(out)) <= set(np.unique(lab))


def test_loader_batching(synth):
    root, manifest = synth
    entries = filedict_from_json(manifest, "NIH_train", 2)  # 8 items
    ds = CaseDataset(entries, root, parse_pan_index("1"), (32, 32, 32))
    loader = Loader(ds, batch_size=3, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 8 // 3
    for b in batches:
        assert b["image"].shape == (3, 32, 32, 32)
        assert b["label"].shape == (3, 32, 32, 32)


def test_loader_no_drop_last(synth):
    root, manifest = synth
    entries = filedict_from_json(manifest, "NIH_val")  # 2 items
    ds = CaseDataset(entries, root, parse_pan_index("1"), (32, 32, 32))
    loader = Loader(ds, batch_size=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["index"][0] == 0 and batches[1]["index"][0] == 1


# ------------------------------------------------------------- augmentation

def test_intensity_normalize_golden():
    x = jnp.array([-1024.0, -200.0, 100.0, 400.0, 2000.0])
    out = np.asarray(augment.intensity_normalize(x))
    np.testing.assert_allclose(out, [-1.0, -1.0, 0.0, 1.0, 1.0])


def test_spatial_augment_shapes_and_determinism(rng):
    imgs = jnp.asarray(rng.normal(0, 100, (2, 32, 32, 32)).astype(np.float32))
    labs = jnp.asarray((rng.random((2, 32, 32, 32)) > 0.7).astype(np.float32))
    key = jax.random.PRNGKey(0)
    a1, l1 = augment.spatial_augment(imgs, labs, key, (32, 32, 32))
    a2, l2 = augment.spatial_augment(imgs, labs, key, (32, 32, 32))
    assert a1.shape == imgs.shape and l1.shape == labs.shape
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # labels stay hard under nearest-neighbor warping
    assert set(np.unique(np.asarray(l1))) <= {0.0, 1.0}
    # different key -> different warp
    a3, _ = augment.spatial_augment(imgs, labs, jax.random.PRNGKey(7),
                                    (32, 32, 32))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_spatial_augment_preserves_foreground_statistics(rng):
    """A centered blob survives the mild (+-0.2 rad, 0.85-1.15x, +-5 vox)
    augmentation with roughly constant volume."""
    d = 48
    zz, yy, xx = np.mgrid[0:d, 0:d, 0:d]
    blob = (((zz - d / 2) ** 2 + (yy - d / 2) ** 2 + (xx - d / 2) ** 2)
            < (d / 5) ** 2).astype(np.float32)
    labs = jnp.asarray(blob[None])
    imgs = jnp.asarray(blob[None] * 100.0)
    vols = []
    for s in range(8):
        _, l1 = augment.spatial_augment(imgs, labs, jax.random.PRNGKey(s),
                                        (d, d, d))
        vols.append(float(np.asarray(l1).sum()))
    base = float(blob.sum())
    # scale in [0.85, 1.15] on coordinates -> volume within ~(1/1.15^3, 1/0.85^3)
    assert min(vols) > base * 0.5
    assert max(vols) < base * 1.8
