"""Checkpoint round-trip, selective component loads, and resume discovery."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.core import checkpoint as ckpt
from vae_segmentation_tpu.train import init_state, optim


def _params():
    return {
        "Seg": {"conv": {"kernel": jnp.arange(6.0).reshape(2, 3),
                         "bias": jnp.zeros(3)}},
        "Vae": {"fc": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)}},
    }


def test_roundtrip_with_opt_state(tmp_path):
    params = _params()
    tx = optim.sgd(0.1)
    state = init_state(params, tx)
    path = os.path.join(tmp_path, "3dmodel", "exp", "model_epoch50.ckpt")
    ckpt.save_checkpoint(path, epoch=50, params=state.params,
                         opt_state=state.opt_state)
    loaded = ckpt.load_checkpoint(path)
    assert loaded["epoch"] == 50
    restored = ckpt.restore_params(params, loaded)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    opt_restored = ckpt.restore_opt_state(state.opt_state, loaded)
    assert jax.tree.structure(opt_restored) == jax.tree.structure(
        state.opt_state)


def test_selective_component_load(tmp_path):
    params = _params()
    # a bare-Seg checkpoint (the seg_nih run saves a bare Segmentation tree)
    seg_only = jax.tree.map(lambda x: x * 7.0, params["Seg"])
    path = os.path.join(tmp_path, "3dmodel", "seg_nih", "best_model.ckpt")
    ckpt.save_checkpoint(path, epoch=10, params=seg_only)
    loaded = ckpt.load_checkpoint(path)
    merged = ckpt.load_component(params, loaded, "Seg")
    np.testing.assert_array_equal(
        np.asarray(merged["Seg"]["conv"]["kernel"]),
        np.asarray(params["Seg"]["conv"]["kernel"]) * 7.0)
    # Vae untouched
    np.testing.assert_array_equal(np.asarray(merged["Vae"]["fc"]["kernel"]),
                                  np.asarray(params["Vae"]["fc"]["kernel"]))


def test_latest_checkpoint(tmp_path):
    root = str(tmp_path)
    for n in (50, 100, 150):
        ckpt.save_checkpoint(
            os.path.join(root, "exp", f"model_epoch{n}.ckpt"),
            epoch=n, params={"w": jnp.zeros(1)})
    found = ckpt.latest_checkpoint(root, "exp")
    assert found.endswith("model_epoch150.ckpt")
    assert ckpt.latest_checkpoint(root, "nope") is None
