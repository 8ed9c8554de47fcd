"""Golden-value tests for ops/losses.py against the reference formulas
(utils/evaluation.py:6-80), computed here with CPU torch.

The torch expressions below restate the reference math (minus .cuda() calls)
so that our jnp implementations are validated against an independent
implementation, not against themselves.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vae_segmentation_tpu.ops import losses as L


def _torch_avg_dsc(source, target, binary=False, botindex=0, topindex=2,
                   return_mean=True, eps=1e-6):
    # torch tensors in NCDHW, mirroring utils/evaluation.py:48-80
    if binary:
        lab = torch.argmax(source, dim=1, keepdim=True)
        source = torch.zeros_like(source).scatter_(1, lab, 1)
        lab = torch.argmax(target, dim=1, keepdim=True)
        target = torch.zeros_like(target).scatter_(1, lab, 1)
    per = (2 * torch.sum(source * target, (2, 3, 4))
           / (torch.sum(source, (2, 3, 4)) + torch.sum(target, (2, 3, 4)) + eps))
    if source.shape[1] > 1:
        per = per[:, botindex:topindex]
        return per.mean() if return_mean else per.mean(1)
    return per.mean() if return_mean else per.mean(1)


def _rand_probs(rng, shape_ncdhw):
    x = rng.random(shape_ncdhw).astype(np.float32)
    return x / x.sum(axis=1, keepdims=True)


@pytest.mark.parametrize("binary", [False, True])
@pytest.mark.parametrize("return_mean", [False, True])
def test_avg_dsc_matches_reference_formula(rng, binary, return_mean):
    b, c, d = 2, 3, 8
    src = _rand_probs(rng, (b, c, d, d, d))
    tgt = _rand_probs(rng, (b, c, d, d, d))
    want = _torch_avg_dsc(torch.from_numpy(src), torch.from_numpy(tgt),
                          binary=binary, botindex=1, topindex=c,
                          return_mean=return_mean).numpy()
    # ours takes channels-last
    got = L.avg_dsc(jnp.asarray(np.moveaxis(src, 1, -1)),
                    jnp.asarray(np.moveaxis(tgt, 1, -1)),
                    binary=binary, botindex=1, topindex=c,
                    return_mean=return_mean)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_avg_dsc_single_channel_skips_slice(rng):
    src = rng.random((2, 1, 8, 8, 8)).astype(np.float32)
    tgt = rng.random((2, 1, 8, 8, 8)).astype(np.float32)
    want = _torch_avg_dsc(torch.from_numpy(src), torch.from_numpy(tgt),
                          botindex=1, topindex=2).numpy()
    got = L.avg_dsc(jnp.asarray(np.moveaxis(src, 1, -1)),
                    jnp.asarray(np.moveaxis(tgt, 1, -1)),
                    botindex=1, topindex=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_kl_loss_matches_reference_formula(rng):
    mean = rng.standard_normal((4, 128)).astype(np.float32)
    std = np.abs(rng.standard_normal((4, 128))).astype(np.float32)
    m, s = torch.from_numpy(mean), torch.from_numpy(std)
    # utils/evaluation.py:42-45
    want = torch.mean(0.5 * (torch.sum(s ** 2, 1) + torch.sum(m ** 2, 1)
                             - 2 * torch.sum(torch.log(s + 1e-5), 1))).numpy()
    got = L.kl_loss(jnp.asarray(mean), jnp.asarray(std))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_binarize_and_confident_binarize(rng):
    x = rng.random((2, 4, 4, 4, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(L.binarize(jnp.asarray(x))),
                                  (x >= 0.5).astype(np.float32))
    cb = np.asarray(L.confident_binarize(jnp.asarray(x)))
    want = x.copy()
    want[x > 0.8] = 1
    want[x < 0.2] = 0
    np.testing.assert_allclose(cb, want)


def test_bce_matches_torch(rng):
    src = np.clip(rng.random((2, 4, 4, 4, 1)).astype(np.float32), 1e-4, 1 - 1e-4)
    tgt = (rng.random((2, 4, 4, 4, 1)) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(src), torch.from_numpy(tgt)).numpy()
    got = L.bce(jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_one_hot_label():
    lab = np.array([[[[0, 1], [1, 0]], [[1, 1], [0, 0]]]], dtype=np.int32)
    oh = np.asarray(L.one_hot_label(jnp.asarray(lab), 2))
    assert oh.shape == (1, 2, 2, 2, 2)
    np.testing.assert_array_equal(oh.argmax(-1), lab)
    np.testing.assert_allclose(oh.sum(-1), 1.0)


def test_dice_global(rng):
    a = rng.random((4, 4, 4)).astype(np.float32)
    b = rng.random((4, 4, 4)).astype(np.float32)
    want = (2 * (a * b).sum() / (a.sum() + b.sum() + 1e-6))
    got = L.dice(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)
