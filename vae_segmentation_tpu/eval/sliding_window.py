"""Sliding-window patch inference with ON-DEVICE stitching.

The reference's only full-volume inference is the legacy, unused host-side
slice loop `predict_vol` (utils/utils.py:742-803); its shipped eval is one ROI
crop per case (SURVEY.md section 3.4). This module is the TPU-native
generalization: tile the volume with overlapping patches, run the (jitted)
model over patch batches, and accumulate probabilities and weights on device
with dynamic_update_slice inside a lax.scan — zero host round-trips per
window.

Connected-component style post-processing stays a host-side scipy.ndimage
concern (see eval/postprocess.py), matching where the reference used
SimpleITK.
"""

from __future__ import annotations

import itertools
import math
from functools import partial
from typing import Callable, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def window_starts(vol_size: Sequence[int], patch: Sequence[int],
                  overlap: float = 0.5) -> np.ndarray:
    """Static [N, 3] grid of window origins covering the volume; stride
    patch*(1-overlap), last window clamped to the boundary."""
    starts_per_axis = []
    for size, p in zip(vol_size, patch):
        if size <= p:
            starts_per_axis.append([0])
            continue
        stride = max(1, int(p * (1.0 - overlap)))
        n = math.ceil((size - p) / stride) + 1
        axis = [min(i * stride, size - p) for i in range(n)]
        starts_per_axis.append(sorted(set(axis)))
    return np.array(list(itertools.product(*starts_per_axis)), np.int32)


def _gaussian_weight(patch: Sequence[int], sigma_scale: float = 0.125
                     ) -> jnp.ndarray:
    """Center-weighted window blending (standard nnU-Net-style importance
    map) so seams vanish in the stitched probability volume."""
    axes = []
    for p in patch:
        x = np.arange(p, dtype=np.float32) - (p - 1) / 2.0
        sigma = p * sigma_scale
        axes.append(np.exp(-0.5 * (x / sigma) ** 2))
    w = axes[0][:, None, None] * axes[1][None, :, None] * axes[2][None, None, :]
    return jnp.asarray(np.maximum(w, 1e-4))


@partial(jax.jit, static_argnames=("apply_fn", "patch", "batch", "n_class"))
def _stitch(apply_fn: Callable, params, volume: jnp.ndarray,
            starts: jnp.ndarray, patch: Tuple[int, int, int],
            batch: int, n_class: int):
    d, h, w = volume.shape
    n = starts.shape[0]
    pad = (-n) % batch
    starts_p = jnp.concatenate(
        [starts, jnp.tile(starts[-1:], (pad, 1))], 0) if pad else starts
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    weight = _gaussian_weight(patch)

    def gather(start):
        return jax.lax.dynamic_slice(volume, (start[0], start[1], start[2]),
                                     patch)

    acc_prob = jnp.zeros((d, h, w, n_class), jnp.float32)
    acc_w = jnp.zeros((d, h, w), jnp.float32)

    def body(carry, chunk):
        acc_prob, acc_w = carry
        chunk_starts, chunk_valid = chunk
        patches = jax.vmap(gather)(chunk_starts)           # [b, *patch]
        probs = apply_fn(params, patches[..., None])       # [b, *patch, C]
        probs = probs * (weight[..., None]
                         * chunk_valid[:, None, None, None, None])
        wmap = weight * chunk_valid[:, None, None, None]

        def scatter_one(carry, item):
            acc_prob, acc_w = carry
            start, p, wm = item
            idx = (start[0], start[1], start[2])
            cur = jax.lax.dynamic_slice(acc_prob, idx + (0,),
                                        patch + (n_class,))
            acc_prob = jax.lax.dynamic_update_slice(acc_prob, cur + p,
                                                    idx + (0,))
            curw = jax.lax.dynamic_slice(acc_w, idx, patch)
            acc_w = jax.lax.dynamic_update_slice(acc_w, curw + wm, idx)
            return (acc_prob, acc_w), None

        (acc_prob, acc_w), _ = jax.lax.scan(
            scatter_one, (acc_prob, acc_w), (chunk_starts, probs, wmap))
        return (acc_prob, acc_w), None

    n_chunks = starts_p.shape[0] // batch
    chunks = (starts_p.reshape(n_chunks, batch, 3),
              valid.reshape(n_chunks, batch))
    (acc_prob, acc_w), _ = jax.lax.scan(body, (acc_prob, acc_w), chunks)
    return acc_prob / jnp.maximum(acc_w, 1e-8)[..., None]


def sliding_window_predict(apply_fn: Callable, params, volume,
                           patch: Tuple[int, int, int] = (128, 128, 128),
                           overlap: float = 0.5, batch: int = 4,
                           n_class: int = 2) -> jnp.ndarray:
    """Full-volume class probabilities [D, H, W, n_class].

    apply_fn(params, images[B, *patch, 1]) -> probs[B, *patch, C] — e.g. a
    partial of SegUNet.apply. Volumes smaller than `patch` are padded (image
    background -1024 pre-normalization should be normalized before calling;
    here we pad with the volume minimum) and cropped back.
    """
    vol = jnp.asarray(volume, jnp.float32)
    orig = vol.shape
    pads = [(0, max(0, p - s)) for s, p in zip(vol.shape, patch)]
    if any(p[1] for p in pads):
        vol = jnp.pad(vol, pads, constant_values=float(jnp.min(vol)))
    starts = jnp.asarray(window_starts(vol.shape, patch, overlap))
    probs = _stitch(apply_fn, params, vol, starts, tuple(patch), batch,
                    n_class)
    return probs[: orig[0], : orig[1], : orig[2]]
