"""Host-side spatial augmentation for the loader worker pool.

The reference runs batchgenerators' augment_spatial on 16 CPU worker
processes, fully overlapped with GPU compute (utils/utils.py:927-969 via
the DataLoader at main_source.py:191-206). Our default ingest instead warps
on the TPU inside the ingest jit (data/augment.py) — measured round 5,
that warp is GATHER-bound on TPU (XLA lowers map_coordinates to per-voxel
gathers; see BENCH.md "ingest cost") and serializes with the train step on
the same chip. This module is the reference-architecture alternative:
`--aug_host` applies the SAME augmentation law in the loader's worker
threads (numpy + scipy, overlapped with device compute), and the device
ingest then only normalizes + folds.

The coordinate math and interpolation below are byte-identical to the
golden-fixture oracle (tools/make_augment_fixtures.py), which is itself
the scipy formulation batchgenerators wraps:
  * per-sample rotation uniform(-0.2, 0.2) rad per axis, composed
    Rx @ Ry @ Rz and applied transposed (rotate_coords_3d);
  * split zoom draw — 50%: uniform(0.85, 1), 50%: uniform(1, 1.15);
  * crop center uniform in [patch//2 - 5, shape - (patch//2 - 5)];
  * image: scipy map_coordinates order 1 or 3, constant border -1024;
  * label: order 0 (nearest), constant border 0.

Determinism: draws come from a per-item np.random.Generator seeded with
(seed, item index), so results do not depend on worker count or schedule —
stronger than the reference's per-worker-process RNG.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from scipy.ndimage import map_coordinates

ROT_RANGE = 0.2
SCALE_RANGE = (0.85, 1.15)
CVAL_IMAGE = -1024.0
CVAL_LABEL = 0.0


def _rot_matrix(ax: float, ay: float, az: float) -> np.ndarray:
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def warp_coords(angles: np.ndarray, scale: float, center: np.ndarray,
                patch_size: Sequence[int]) -> np.ndarray:
    """[3, *patch] sample coordinates of the affine warp (oracle math)."""
    axes = [np.arange(s, dtype=np.float64) - (s - 1) / 2.0
            for s in patch_size]
    coords = np.stack(np.meshgrid(*axes, indexing="ij"), axis=0)
    m = _rot_matrix(*angles)
    coords = (m.T @ coords.reshape(3, -1)).reshape(coords.shape)
    coords = coords * scale
    return coords + np.asarray(center, np.float64)[:, None, None, None]


def draw_params(rng: np.random.Generator, in_shape: Sequence[int],
                patch_size: Sequence[int]):
    """(angles, scale, center) with the reference's draw laws."""
    angles = rng.uniform(-ROT_RANGE, ROT_RANGE, 3)
    if rng.random() < 0.5:
        scale = rng.uniform(SCALE_RANGE[0], 1.0)
    else:
        scale = rng.uniform(1.0, SCALE_RANGE[1])
    dist = np.array([p // 2 - 5 for p in patch_size], np.float64)
    center = dist + rng.random(3) * (np.asarray(in_shape, np.float64)
                                     - 2 * dist)
    return angles, float(scale), center


def apply_warp(image: np.ndarray, label: np.ndarray, angles, scale,
               center, patch_size: Sequence[int], order: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    coords = warp_coords(np.asarray(angles, np.float64), float(scale),
                         center, patch_size)
    img = map_coordinates(image.astype(np.float64), coords, order=order,
                          mode="constant", cval=CVAL_IMAGE)
    lab = map_coordinates(label.astype(np.float64), coords, order=0,
                          mode="constant", cval=CVAL_LABEL)
    return img.astype(np.float32), lab.astype(np.float32)


def augment_spatial_host(image: np.ndarray, label: np.ndarray,
                         rng: np.random.Generator,
                         patch_size: Sequence[int],
                         order: int = 3
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """One sample's random affine warp, reference law, on the host."""
    angles, scale, center = draw_params(rng, image.shape, patch_size)
    return apply_warp(image, label, angles, scale, center, patch_size,
                      order)
