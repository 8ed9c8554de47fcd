"""Mesh/sharding tests on the 8-device virtual CPU platform: DP batch
sharding, spatial (halo-exchange) sharding of a conv forward, and a sharded
train step whose gradients XLA all-reduces implicitly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vae_segmentation_tpu import parallel
from vae_segmentation_tpu.models import SegUNet
from vae_segmentation_tpu.train import init_state, make_seg_train_step, optim

FMAPS = (2, 3, 4, 5, 6, 8)


def test_virtual_device_count():
    assert jax.device_count() == 8


def test_make_mesh_axes():
    mesh = parallel.make_mesh()
    assert mesh.shape == {"data": 8, "spatial": 1}
    mesh = parallel.make_mesh(n_data=4, n_spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}


def test_shard_batch_placement():
    mesh = parallel.make_mesh()
    batch = {"image": np.zeros((8, 16, 16, 16), np.float32),
             "label": np.zeros((8, 16, 16, 16), np.float32),
             "index": np.arange(8)}
    out = parallel.shard_batch(mesh, batch)
    assert out["image"].sharding.spec == P("data")
    # 1 batch element per device
    assert out["image"].addressable_shards[0].data.shape[0] == 1


def test_sharded_seg_train_step_matches_single_device():
    """The same step on a sharded batch and on one device must agree — the
    implicit psum gradient all-reduce is numerically the same sum."""
    model = SegUNet(n_class=2, fmaps=FMAPS, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(8, 16, 16, 16)).astype(np.float32)
    lab = (rng.random((8, 16, 16, 16)) > 0.5).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(img)[..., None])["params"]
    tx = optim.sgd(0.1)
    step = make_seg_train_step(model, tx, n_class=2)

    # single device
    s1 = init_state(jax.tree.map(jnp.array, params), tx)
    s1, m1 = step(s1, jnp.asarray(img), jnp.asarray(lab))

    # 8-way data parallel
    mesh = parallel.make_mesh()
    sh = parallel.batch_sharding(mesh)
    img_s = jax.device_put(img, sh)
    lab_s = jax.device_put(lab, sh)
    p_rep = parallel.replicate_params(mesh, jax.tree.map(jnp.array, params))
    s8 = init_state(p_rep, tx)
    s8, m8 = step(s8, img_s, lab_s)

    np.testing.assert_allclose(float(m1["dice_loss"]), float(m8["dice_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_sharded_seg_step_with_s2d(monkeypatch):
    """The space-to-depth path must compile and run under DP sharding (the
    fold reshape crosses the batch-sharded leading dims only trivially)."""
    monkeypatch.setenv("VAESEG_S2D", "1")
    model = SegUNet(n_class=2, fmaps=FMAPS, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    img = rng.normal(size=(8, 32, 32, 32)).astype(np.float32)
    lab = (rng.random((8, 32, 32, 32)) > 0.5).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(img)[..., None])["params"]
    tx = optim.sgd(0.1)
    step = make_seg_train_step(model, tx, n_class=2)
    mesh = parallel.make_mesh()
    sh = parallel.batch_sharding(mesh)
    s8 = init_state(parallel.replicate_params(
        mesh, jax.tree.map(jnp.array, params)), tx)
    s8, m8 = step(s8, jax.device_put(img, sh), jax.device_put(lab, sh))
    assert np.isfinite(float(m8["dice_loss"]))


def test_spatial_sharding_conv_forward():
    """Shard the volume's D axis over 'spatial': XLA inserts the halo
    exchanges for the 3^3 convs; result must equal the unsharded forward."""
    model = SegUNet(n_class=2, fmaps=FMAPS, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 32, 16, 16, 1)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(img))["params"]

    ref = model.apply({"params": params}, jnp.asarray(img))

    mesh = parallel.make_mesh(n_data=2, n_spatial=4)
    sh = parallel.batch_sharding(mesh, shard_spatial=True)
    img_s = jax.device_put(img, sh)
    p_rep = parallel.replicate_params(mesh, params)
    out = jax.jit(lambda p, x: model.apply({"params": p}, x))(p_rep, img_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
