"""Host->device input pipeline.

Replaces the reference's 16-worker pinned-memory torch DataLoader
(main_source.py:237-243) with a thread-pool loader + double-buffered
device_put prefetch. Per-item work on the host is only IO + CropResize
geometry (irregular shapes); augmentation and intensity math run on-device in
the compiled step (data/augment.py).

Determinism: per-item host randomness is not used at all by default (the
reference's host-side augmentation randomness moved on-device, keyed by the
step PRNG); shuffling uses a seeded numpy Generator. With --aug_host the
warp runs here instead (AugmentedDataset, data/host_augment.py), seeded per
item index — still schedule-independent.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

import jax

from vae_segmentation_tpu.data.transforms import (
    MaskIndex,
    crop_resize,
    load_merge_case,
)


class CaseDataset:
    """manifest entries -> {'image','label','ori_shape','id'} at output_size.

    Equivalent to BaseDataset + (NumpyLoader_Multi_merge -> CropResize)
    (utils/utils.py:61-88, main_source.py:191-192).
    """

    def __init__(self, entries: Sequence[str], root_dir: str,
                 mask_index: Optional[MaskIndex] = None,
                 output_size: Sequence[int] = (128, 128, 128),
                 shift: int = 0):
        self.entries = list(entries)
        self.root_dir = root_dir
        self.mask_index = mask_index
        self.output_size = tuple(output_size)
        self.shift = shift

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        case = load_merge_case(self.root_dir, self.entries[idx],
                               self.mask_index)
        out = crop_resize(case["image"], case["label"], self.output_size,
                          shift=self.shift, bbox=case.get("bbox"))
        out["id"] = case["id"]
        out["index"] = idx
        return out


class AugmentedDataset:
    """CaseDataset + the reference's spatial augmentation ON THE HOST
    (data/host_augment.py), applied in the loader's worker threads so it
    overlaps device compute — the reference's own 16-worker architecture
    (main_source.py:191-206). Each item draws from a Generator seeded with
    (seed, idx): deterministic under any worker count/schedule."""

    def __init__(self, base: CaseDataset, patch_size: Sequence[int],
                 order: int, seed: int):
        self.base = base
        self.patch_size = tuple(patch_size)
        self.order = order
        self.seed = seed

    def __len__(self) -> int:
        return len(self.base)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from vae_segmentation_tpu.data.host_augment import \
            augment_spatial_host

        out = self.base[idx]
        rng = np.random.default_rng((self.seed, idx))
        img, lab = augment_spatial_host(out["image"], out["label"], rng,
                                        self.patch_size, order=self.order)
        out["image"], out["label"] = img, lab
        return out


def _collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {
        "image": np.stack([it["image"] for it in items]).astype(np.float32),
        "label": np.stack([it["label"] for it in items]).astype(np.float32),
        "ori_shape": np.stack([it["ori_shape"] for it in items]),
        "index": np.array([it["index"] for it in items], np.int32),
    }


class Loader:
    """Batched, threaded, prefetching loader.

    shuffle/drop_last mirror the torch DataLoader flags used by each trainer
    (main_source.py:237-241). device_sharding, when given, places each batch
    with jax.device_put so the compiled step reads an already-sharded array.
    """

    def __init__(self, dataset: CaseDataset, batch_size: int, *,
                 shuffle: bool = False, drop_last: bool = False,
                 num_workers: int = 8, seed: int = 0,
                 device_sharding=None, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.rng = np.random.default_rng(seed)
        self.device_sharding = device_sharding
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def __iter__(self) -> Iterator[Dict]:
        batches = self._batch_indices()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                # submit item loads batch-by-batch, keep `prefetch` in flight
                futures = [
                    [pool.submit(self.dataset.__getitem__, int(i)) for i in b]
                    for b in batches
                ]
                for fb in futures:
                    if stop.is_set():
                        for f in fb:
                            f.cancel()
                        continue
                    try:
                        batch = _collate([f.result() for f in fb])
                        if self.device_sharding is not None:
                            batch = {
                                k: jax.device_put(v, self.device_sharding)
                                if k in ("image", "label") else v
                                for k, v in batch.items()
                            }
                        out_q.put(batch)
                    except Exception as e:  # surface loader errors to consumer
                        out_q.put(e)
                        return
                out_q.put(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
