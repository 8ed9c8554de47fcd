"""Model-zoo structural tests: output shapes, probability semantics, and exact
parameter-count parity with the reference torch modules
(joint_model.py:204-501), checked via jax.eval_shape so no 128^3 compute runs
on the test CPUs.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_DIR, requires_reference
from vae_segmentation_tpu.models import (
    Embed,
    FusionNet,
    Joint,
    Joint2,
    SegUNet,
    ShapeEncoder,
    ShapeVAE,
)

KEY = jax.random.PRNGKey(0)

# Tiny configs so CPU test forwards stay fast; the full-size architecture is
# covered by the eval_shape param-count parity tests below.
SMALL_FMAPS = (2, 3, 4, 5, 6, 8)
SMALL_BOTTLENECK = 8  # fmaps[5] * 1^3 at a 32^3 input


def n_params(tree):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


def shape_init(model, *args, rngs=("params", "reparam", "dropout"), **kwargs):
    keys = {name: KEY for name in rngs}
    return jax.eval_shape(lambda: model.init(keys, *args, **kwargs))


# ---------------------------------------------------------------- small runs

def test_vae_forward_small():
    model = ShapeVAE(n_class=2, dim=16, fmaps=SMALL_FMAPS,
                     bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    variables = model.init({"params": KEY, "reparam": KEY}, x, if_random=True,
                           scale=0.35)
    recon, mean, std = model.apply(variables, x, if_random=True, scale=0.35,
                                   rngs={"reparam": KEY})
    assert recon.shape == x.shape
    assert mean.shape == (1, 16) and std.shape == (1, 16)
    np.testing.assert_allclose(np.asarray(recon.sum(-1)), 1.0, rtol=1e-5)
    assert np.all(np.asarray(std) >= 0)


def test_vae_mid_input_decode():
    model = ShapeVAE(n_class=2, dim=16, fmaps=SMALL_FMAPS,
                     bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    variables = model.init({"params": KEY, "reparam": KEY}, x)
    z = jnp.zeros((1, 16), jnp.float32)
    recon = model.apply(variables, z, mid_input=True)
    assert recon.shape == x.shape


def test_vae_decoder_dropout_is_stochastic():
    model = ShapeVAE(n_class=2, dim=16, fmaps=SMALL_FMAPS,
                     bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    x = jnp.ones((1, 32, 32, 32, 2), jnp.float32) * 0.5
    variables = model.init({"params": KEY, "reparam": KEY}, x)
    r1 = model.apply(variables, x, dropout=0.5,
                     rngs={"reparam": KEY, "dropout": jax.random.PRNGKey(1)})[0]
    r2 = model.apply(variables, x, dropout=0.5,
                     rngs={"reparam": KEY, "dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_unet_forward_small():
    model = SegUNet(n_class=2, fmaps=SMALL_FMAPS, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = model.init({"params": KEY}, x)
    pred = model.apply(variables, x)
    assert pred.shape == (1, 32, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(pred.sum(-1)), 1.0, rtol=1e-5)


def test_encoder_forward_small():
    model = ShapeEncoder(dim=1, fmaps=SMALL_FMAPS,
                         bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 32, 1), jnp.float32)
    variables = model.init({"params": KEY}, x)
    score = model.apply(variables, x)
    assert score.shape == (2, 1)
    assert np.all((np.asarray(score) >= 0) & (np.asarray(score) <= 1))


def test_fusion_forward_small():
    model = FusionNet(n_class=2, fmaps=SMALL_FMAPS, dtype=jnp.float32)
    img = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    mask = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    variables = model.init({"params": KEY}, img, mask)
    pred = model.apply(variables, img, mask)
    assert pred.shape == (1, 32, 32, 32, 2)


def test_joint_forward_small_and_param_tree_keys():
    model = Joint(n_class=2, dim=16, fmaps=SMALL_FMAPS,
                  bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    img = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = model.init({"params": KEY, "reparam": KEY}, img)
    assert set(variables["params"].keys()) == {"Seg", "Vae"}
    pred, recon, mean, std = model.apply(variables, img, rngs={"reparam": KEY})
    assert pred.shape == (1, 32, 32, 32, 2)
    assert recon.shape == (1, 32, 32, 32, 2)
    assert mean.shape == (1, 16) and std.shape == (1, 16)


def test_joint2_forward_small():
    model = Joint2(n_class=2, fmaps=SMALL_FMAPS, dtype=jnp.float32)
    img = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    variables = model.init({"params": KEY}, img)
    assert set(variables["params"].keys()) == {"Seg", "Dis"}
    pred, score = model.apply(variables, img)
    assert pred.shape == (1, 32, 32, 32, 2)
    assert score.shape == (1, 1)


def test_embed_forward_small():
    model = Embed(n_class=2, dim=16, fmaps=SMALL_FMAPS,
                  bottleneck=SMALL_BOTTLENECK, dtype=jnp.float32)
    img = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    gt = jnp.zeros((1, 32, 32, 32, 2), jnp.float32)
    variables = model.init({"params": KEY, "reparam": KEY}, img, gt)
    assert set(variables["params"].keys()) == {"Encoder", "Vae", "Fusion"}
    out = model.apply(variables, img, gt, rngs={"reparam": KEY})
    for k in ("latent_code", "gt_recon", "init_seg", "pred", "seg_recon"):
        assert k in out


# -------------------------------------------------- parameter-count parity

def _reference_models():
    sys.path.insert(0, REFERENCE_DIR)
    import joint_model  # noqa: PLC0415

    return joint_model


def _torch_n_params(m):
    return sum(p.numel() for p in m.parameters())


@requires_reference
@pytest.mark.parametrize("which", ["vae", "seg", "encoder", "fusion"])
def test_param_count_parity(which):
    jm = _reference_models()
    if which == "vae":
        ref = jm.VAE(n_channels=2, n_class=2, norm_type=1, dim=128)
        ours = ShapeVAE(n_class=2, dim=128)
        x = jnp.zeros((1, 128, 128, 128, 2), jnp.bfloat16)
        shapes = shape_init(ours, x)
    elif which == "seg":
        ref = jm.Segmentation(n_channels=1, n_class=2, norm_type=1)
        ours = SegUNet(n_class=2)
        x = jnp.zeros((1, 128, 128, 128, 1), jnp.bfloat16)
        shapes = shape_init(ours, x, rngs=("params",))
    elif which == "encoder":
        ref = jm.Encoder(n_channels=1, dim=1, norm_type=1)
        ours = ShapeEncoder(dim=1)
        x = jnp.zeros((1, 128, 128, 128, 1), jnp.bfloat16)
        shapes = shape_init(ours, x, rngs=("params",))
    else:
        ref = jm.Fusion(n_channels_img=1, n_channels_mask=2, n_class=2,
                        norm_type=1)
        ours = FusionNet(n_class=2)
        img = jnp.zeros((1, 128, 128, 128, 1), jnp.bfloat16)
        mask = jnp.zeros((1, 128, 128, 128, 2), jnp.bfloat16)
        shapes = shape_init(ours, img, mask, rngs=("params",))
    assert n_params(shapes["params"]) == _torch_n_params(ref)


def test_mc_dropout_fast_path(rng, monkeypatch):
    """The hardware-RNG dropout mask path (VAESEG_FAST_DROPOUT=1) is
    deterministic per key, respects the rate, and applies the 1/keep
    scaling — same contract as the threefry path."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from vae_segmentation_tpu.models.blocks import mc_dropout

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return mc_dropout(self, x, 0.5)

    x = jnp.ones((2, 8, 8, 8, 4))
    for fast in ("1", "0"):
        monkeypatch.setenv("VAESEG_FAST_DROPOUT", fast)
        m = M()
        y1 = m.apply({}, x, rngs={"dropout": jax.random.PRNGKey(3)})
        y2 = m.apply({}, x, rngs={"dropout": jax.random.PRNGKey(3)})
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        frac = float(jnp.mean((y1 == 0).astype(jnp.float32)))
        assert 0.40 < frac < 0.60, (fast, frac)
        assert set(np.round(np.unique(np.asarray(y1)), 4)) <= {0.0, 2.0}
