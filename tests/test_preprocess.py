"""Offline preprocessing (data/preprocess.py) vs the reference
data_process.py semantics — pure-numpy parts (nibabel is not in the test
image; the NIfTI reader is a thin lazy-imported shell around these)."""

import json
import os

import numpy as np
import pytest

from vae_segmentation_tpu.data.preprocess import (
    cube_crop,
    reorient,
    resample_iso,
    update_manifest,
)


def test_reorient_matches_reference_formula(rng):
    vol = rng.normal(size=(5, 7, 9)).astype(np.float32)
    for spacing in ([-1.0, -1.0, 1.0], [1.0, 1.0, 1.0], [-0.7, 0.8, -2.0]):
        spacing = np.asarray(spacing)
        # reference data_process.py:26-30 restated
        ind = (((-spacing > 0) - 0.5) * 2).astype(int)
        want = np.transpose(vol, (1, 0, 2))[::ind[1], ::ind[0], ::ind[2]]
        got = reorient(vol, spacing)
        np.testing.assert_array_equal(got, want)


def test_resample_iso_sizes_and_label_integrality(rng):
    img = rng.normal(size=(10, 12, 8)).astype(np.float32) * 100
    lab = (rng.random((10, 12, 8)) > 0.7).astype(np.float32)
    spacing = np.asarray([-2.0, -1.5, 3.0])
    out_img, out_lab = resample_iso(img, lab, spacing)
    assert out_img.shape == (20, 18, 24)
    assert out_lab.shape == (20, 18, 24)
    # order-0 resample keeps labels binary
    assert set(np.unique(out_lab)) <= {0.0, 1.0}


def test_cube_crop_is_cube_and_contains_foreground():
    img = np.zeros((100, 90, 80), np.float32)
    lab = np.zeros((100, 90, 80), np.float32)
    lab[40:50, 30:45, 20:28] = 1
    ci, cl = cube_crop(img, lab, pad=(2, 2, 2))
    # widest axis: indices 30..44 -> bbox [28, 46] -> L = 18 (interior case)
    assert ci.shape == cl.shape == (18, 18, 18)
    assert cl.sum() == lab.sum()


def test_cube_crop_clamps_at_borders():
    lab = np.zeros((40, 40, 40), np.float32)
    lab[0:10, 0:30, 0:5] = 1  # near the origin: pad would go negative
    img = np.ones_like(lab)
    ci, cl = cube_crop(img, lab, pad=(32, 32, 32))
    assert ci.shape == cl.shape  # clamped, possibly non-cubic like reference
    assert cl.sum() == lab.sum()


def test_cube_crop_raises_on_empty():
    z = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        cube_crop(z, z)


def test_update_manifest_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "m.json")
    update_manifest(path, "NIH_train", ["a/merge.npy", "b/merge.npy"])
    update_manifest(path, "NIH_train", ["b/merge.npy", "c/merge.npy"])
    update_manifest(path, "NIH_val", ["d/merge.npy"])
    data = json.load(open(path))
    assert data["NIH_train"] == ["a/merge.npy", "b/merge.npy", "c/merge.npy"]
    assert data["NIH_val"] == ["d/merge.npy"]
