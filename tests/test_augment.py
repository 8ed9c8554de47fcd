"""Device-side spatial augmentation (data/augment.py) vs the
batchgenerators semantics it replaces (utils/utils.py:927-969 configured at
main_source.py:197-206): statistical and structural checks — the pinned
batchgenerators is not installed here, so parity is asserted on the
documented distribution properties rather than bit-exactness (order-1 vs
order-3 interpolation differs by design, see the module docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_segmentation_tpu.data import augment


@pytest.fixture()
def vol(rng):
    img = rng.normal(100.0, 50.0, (2, 24, 24, 24)).astype(np.float32)
    lab = np.zeros((2, 24, 24, 24), np.float32)
    lab[:, 8:16, 8:16, 8:16] = 1.0
    return jnp.asarray(img), jnp.asarray(lab)


def test_deterministic_per_key(vol):
    img, lab = vol
    k = jax.random.PRNGKey(3)
    a1 = augment.spatial_augment(img, lab, k, patch_size=(24, 24, 24))
    a2 = augment.spatial_augment(img, lab, k, patch_size=(24, 24, 24))
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    b = augment.spatial_augment(img, lab, jax.random.PRNGKey(4),
                                patch_size=(24, 24, 24))
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b[0]))


def test_label_nearest_stays_binary(vol):
    img, lab = vol
    for seed in range(4):
        _, lab_out = augment.spatial_augment(
            img, lab, jax.random.PRNGKey(seed), patch_size=(24, 24, 24))
        assert set(np.unique(np.asarray(lab_out))) <= {0.0, 1.0}


def test_border_fill_value(rng):
    """A patch bigger than a tiny input must expose the -1024 border fill
    (MySpatialTransform border_cval_data, main_source.py:205)."""
    img = jnp.full((1, 8, 8, 8), 500.0)
    lab = jnp.ones((1, 8, 8, 8))
    img_out, lab_out = augment.spatial_augment(
        img, lab, jax.random.PRNGKey(0), patch_size=(16, 16, 16))
    assert float(jnp.min(img_out)) == pytest.approx(-1024.0, abs=0.01)
    # label border fill is 0
    assert float(jnp.min(lab_out)) == 0.0
    assert float(jnp.max(lab_out)) == 1.0


def test_scale_distribution_matches_batchgenerators_split(vol, rng):
    """batchgenerators draws zoom-in U(0.85,1) half the time and zoom-out
    U(1,1.15) the other half; the augmented foreground volume ratio must
    bracket 1 accordingly over many draws."""
    img, lab = vol
    base = float(jnp.sum(lab[0]))
    ratios = []
    for seed in range(24):
        _, lab_out = augment.spatial_augment(
            img, lab, jax.random.PRNGKey(100 + seed),
            patch_size=(24, 24, 24))
        ratios.append(float(jnp.sum(lab_out[0])) / base)
    ratios = np.array(ratios)
    # scale multiplies OUTPUT coordinates: scale<1 zooms IN (bigger organ).
    # Coordinates scale by s in 3D -> volume by ~s^-3 in [1.15^-3, 0.85^-3]
    # plus boundary/crop effects; allow slack but require both directions.
    assert ratios.max() > 1.02 and ratios.min() < 0.98
    assert ratios.min() > 0.5 and ratios.max() < 2.0


def test_intensity_normalize_formula(rng):
    x = jnp.asarray(rng.uniform(-2000, 2000, (4, 5, 5, 5)), jnp.float32)
    got = augment.intensity_normalize(x)
    want = (np.clip(np.asarray(x), -200, 400) - 100.0) / 300.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    assert float(jnp.min(got)) >= -1.0 and float(jnp.max(got)) <= 1.0
