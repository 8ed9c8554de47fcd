"""Generate golden augmentation fixtures (tests/fixtures/augment_golden.npz).

The oracle reimplements batchgenerators' augment_spatial coordinate math and
interpolation for the reference's exact config (utils/utils.py:927-969 as
configured at main_source.py:197-206) with numpy + scipy:

  * zero-centered mesh over the patch, rotated by (Rx@Ry@Rz)^T, scaled by the
    split zoom draw, shifted to a crop center uniform in
    [patch//2 - 5, shape - (patch//2 - 5)];
  * image: scipy.ndimage.map_coordinates order=3 (batchgenerators
    order_data=3), mode='constant', cval=-1024;
  * label: order=0 (order_seg=0), cval=0 — batchgenerators' is_seg path with
    order 0 reduces to nearest neighbor.

batchgenerators itself is a thin wrapper over these scipy calls, so this
oracle IS the reference semantics up to the library's own version drift.
Fixtures record the affine draws plus both order-3 and order-1 oracle
outputs, so the test can (a) check our device warp against the order-1
oracle near-exactly and (b) quantify the order-3 vs order-1 delta.

Run: python tools/make_augment_fixtures.py
"""

import os

import numpy as np
from scipy.ndimage import map_coordinates

ROT_RANGE = 0.2
SCALE_RANGE = (0.85, 1.15)
CVAL = -1024.0

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "augment_golden.npz")


def rot_matrix(ax, ay, az):
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def oracle_coords(angles, scale, center, patch_size):
    axes = [np.arange(s, dtype=np.float64) - (s - 1) / 2.0
            for s in patch_size]
    coords = np.stack(np.meshgrid(*axes, indexing="ij"), axis=0)
    m = rot_matrix(*angles)
    coords = (m.T @ coords.reshape(3, -1)).reshape(coords.shape)
    coords = coords * scale
    return coords + np.asarray(center)[:, None, None, None]


def main():
    rng = np.random.default_rng(20260816)
    patch = (24, 24, 24)
    in_shape = (32, 36, 30)
    n_cases = 6

    # smooth-ish image (separable low-frequency content + noise) so the
    # order-3 vs order-1 delta is representative of CT, not of white noise
    d, h, w = in_shape
    zz, yy, xx = np.meshgrid(np.linspace(0, 3 * np.pi, d),
                             np.linspace(0, 2 * np.pi, h),
                             np.linspace(0, 4 * np.pi, w), indexing="ij")
    image = (200.0 * np.sin(zz) * np.cos(yy) + 150.0 * np.sin(xx)
             + rng.normal(0, 20.0, in_shape)).astype(np.float32)
    label = np.zeros(in_shape, np.float32)
    label[8:20, 10:26, 6:22] = 1.0

    dist = np.array([p // 2 - 5 for p in patch], np.float64)

    recs = {"image": image, "label": label,
            "patch": np.array(patch), "in_shape": np.array(in_shape)}
    for i in range(n_cases):
        angles = rng.uniform(-ROT_RANGE, ROT_RANGE, 3)
        if rng.random() < 0.5:
            scale = rng.uniform(SCALE_RANGE[0], 1.0)
        else:
            scale = rng.uniform(1.0, SCALE_RANGE[1])
        center = dist + rng.random(3) * (np.asarray(in_shape) - 2 * dist)
        coords = oracle_coords(angles, scale, center, patch)
        img3 = map_coordinates(image.astype(np.float64), coords, order=3,
                               mode="constant", cval=CVAL)
        img1 = map_coordinates(image.astype(np.float64), coords, order=1,
                               mode="constant", cval=CVAL)
        lab0 = map_coordinates(label.astype(np.float64), coords, order=0,
                               mode="constant", cval=0.0)
        recs[f"angles_{i}"] = angles.astype(np.float32)
        recs[f"scale_{i}"] = np.float32(scale)
        recs[f"center_{i}"] = center.astype(np.float32)
        recs[f"img_order3_{i}"] = img3.astype(np.float32)
        recs[f"img_order1_{i}"] = img1.astype(np.float32)
        recs[f"lab_order0_{i}"] = lab0.astype(np.float32)
        delta = np.abs(img3 - img1)
        print(f"case {i}: order3-vs-order1 mean|Δ|={delta.mean():.3f} "
              f"max|Δ|={delta.max():.2f} (image dynamic range "
              f"{image.max() - image.min():.0f})")

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, n_cases=n_cases, **recs)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
