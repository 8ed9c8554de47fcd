"""TensorBoard observability (reference utils/saver.py:7-27).

Same surface: Saver(display_dir, display_freq).write_display(it, loss, image,
force_write) writing scalars + image-grid panels every display_freq iters.
Image panels are [N, H, W] (or [N, 1, H, W]) mid-slice stacks; the grid layout
reproduces torchvision.utils.make_grid(nrow=5, padding=2) with the reference's
/2 + 0.5 display normalization.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


def make_grid(images: np.ndarray, nrow: int = 5, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """[N, H, W] -> [H', W'] tiled grid (torchvision make_grid semantics)."""
    images = np.asarray(images)
    if images.ndim == 4:  # [N, 1, H, W]
        images = images[:, 0]
    n, h, w = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.full((nrows * (h + padding) + padding,
                    ncol * (w + padding) + padding), pad_value,
                   dtype=np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = c * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


class Saver:
    """Scalar + image TB writer; no-op when tensorboardX is unavailable."""

    def __init__(self, display_dir: str, display_freq: int = 10):
        self.display_dir = display_dir
        self.display_freq = display_freq
        os.makedirs(display_dir, exist_ok=True)
        self.writer = SummaryWriter(logdir=display_dir) \
            if SummaryWriter is not None else None

    def write_display(self, total_it: int,
                      loss: Sequence[Tuple[str, float]],
                      image: Optional[Dict[str, np.ndarray]] = None,
                      force_write: bool = False,
                      verbose: bool = True) -> None:
        if not (force_write or (total_it + 1) % self.display_freq == 0):
            return
        if self.writer is not None and image is not None:
            for name, im in image.items():
                grid = make_grid(np.asarray(im)) / 2.0 + 0.5
                self.writer.add_image(name, grid[None], total_it)
        for name, value in loss:
            if self.writer is not None:
                self.writer.add_scalar(name, float(value), total_it)
            if verbose:
                print(name, float(value), total_it)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def mid_slice_panel(*volumes: np.ndarray) -> np.ndarray:
    """Stack the mid-depth slice of several [B, D, H, W(, C)] volumes into an
    [N, H, W] panel — the reference's `_display` tensors
    (main_source.py:394-396)."""
    panels: List[np.ndarray] = []
    for v in volumes:
        v = np.asarray(v)
        if v.ndim == 5:
            v = v[..., 0]
        h = v.shape[3]
        panels.append(v[0, :, :, h // 2])
    return np.stack(panels)
