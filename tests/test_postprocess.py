"""Connected-component post-processing: the predict_vol rule
(reference utils/utils.py:777-796 — keep the <=2 largest components with
>=10000 voxels, drop the rest) as a host-side scipy filter
(eval/postprocess.py), and its --postprocess wiring into the
sliding-window eval path (cli/common.py::run_sliding_window_eval).
"""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from vae_segmentation_tpu.eval.postprocess import (connected_components,
                                                   largest_components)


def _ball(shape, center, r):
    g = np.stack(np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"))
    return (np.sum((g - np.asarray(center)[:, None, None, None]) ** 2,
                   axis=0) <= r * r)


def test_largest_components_rule():
    """Three components (sizes ~1000, ~250, ~30): with min_voxels=100 the
    two largest survive, the speck is dropped (keep=2 AND the size floor,
    utils/utils.py:791-796)."""
    mask = np.zeros((48, 48, 48), bool)
    mask |= _ball(mask.shape, (14, 14, 14), 6)     # ~905 vox
    mask |= _ball(mask.shape, (36, 36, 36), 4)     # ~257 vox
    mask |= _ball(mask.shape, (40, 10, 40), 1.5)   # ~19 vox
    out = largest_components(mask, min_voxels=100, keep=2)
    assert out.dtype == np.int8
    big = _ball(mask.shape, (14, 14, 14), 6)
    mid = _ball(mask.shape, (36, 36, 36), 4)
    speck = _ball(mask.shape, (40, 10, 40), 1.5)
    assert np.all(out[big] == 1) and np.all(out[mid] == 1)
    assert np.all(out[speck & ~big & ~mid] == 0)

    # rank cut: keep=1 drops the mid component too
    out1 = largest_components(mask, min_voxels=100, keep=1)
    assert np.all(out1[big] == 1) and np.all(out1[mid & ~big] == 0)

    # size floor alone: everything below min_voxels -> empty
    assert largest_components(mask, min_voxels=10 ** 6).sum() == 0
    # empty input -> empty output, right dtype
    empty = largest_components(np.zeros((8, 8, 8), np.float32))
    assert empty.sum() == 0 and empty.dtype == np.int8


def test_connected_components_count():
    mask = np.zeros((32, 32, 32), bool)
    mask |= _ball(mask.shape, (8, 8, 8), 3)
    mask |= _ball(mask.shape, (24, 24, 24), 3)
    labeled, n = connected_components(mask)
    assert n == 2
    assert labeled.max() == 2 and (labeled > 0).sum() == mask.sum()


@pytest.fixture()
def sw_case(tmp_path):
    """One on-disk case for the sliding-window runner: GT label is a single
    blob; the image is bright exactly on the blob PLUS a small spurious
    bright speck, so a threshold 'model' predicts blob+speck and the CC
    filter removes exactly the speck."""
    blob = _ball((48, 48, 48), (20, 24, 24), 7)          # ~1400 vox
    speck = _ball((48, 48, 48), (40, 40, 40), 2)         # ~30 vox
    img = np.full((48, 48, 48), -1024.0, np.float32)
    img[blob | speck] = 400.0
    lab = blob.astype(np.int16)
    case_dir = tmp_path / "case1"
    case_dir.mkdir()
    np.save(case_dir / "merge.npy",
            np.stack([img, lab.astype(np.float32)], axis=-1))
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({"VAL": ["case1/merge.npy"]}))
    return {"root": str(tmp_path), "manifest": str(manifest),
            "blob": blob, "speck": speck}


def _threshold_apply(params, x):
    """Stub seg net: class-1 where the normalized intensity is positive
    (ingest maps 400 HU -> 1.0, background -1024 -> -1.0)."""
    fg = (x[..., 0] > 0.0).astype(jnp.float32)
    return jnp.stack([1.0 - fg, fg], axis=-1)


def _sw_cfg(case, postprocess):
    return SimpleNamespace(
        data_path=case["manifest"], patch_size=(32, 32, 32),
        sw_overlap=0.5, batch_size=2, postprocess=postprocess,
        postprocess_min_voxels=100)


def test_sliding_window_postprocess_removes_speck(sw_case):
    from vae_segmentation_tpu.cli.common import run_sliding_window_eval

    raw, _ = run_sliding_window_eval(
        _sw_cfg(sw_case, False), _threshold_apply, None, n_class=2,
        data_root=sw_case["root"], list_key="VAL", pan_index="1")
    filtered, scores = run_sliding_window_eval(
        _sw_cfg(sw_case, True), _threshold_apply, None, n_class=2,
        data_root=sw_case["root"], list_key="VAL", pan_index="1")
    # without the filter the speck is a false positive; with it the
    # prediction is exactly the GT blob
    assert raw < 1.0 - 1e-4
    assert filtered > raw
    assert filtered > 1.0 - 1e-4, (raw, filtered, scores)


def test_postprocess_cli_flag_parses():
    """--postprocess / --postprocess_min_voxels reach the config for both
    trainer CLIs (core/config.py shared flag table)."""
    from vae_segmentation_tpu.core.config import (parse_source_args,
                                                  parse_target_args)

    for parse in (parse_source_args, parse_target_args):
        cfg = parse(["x", "--method", "vae_train", "--postprocess",
                     "--postprocess_min_voxels", "77"])
        assert cfg.postprocess is True
        assert cfg.postprocess_min_voxels == 77
        cfg = parse(["x", "--method", "vae_train"])
        assert cfg.postprocess is False
        assert cfg.postprocess_min_voxels == 10000
