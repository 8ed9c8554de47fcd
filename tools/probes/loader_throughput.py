"""Loader throughput at production batch sizes (BENCH.md; VERDICT item 7).

Measures data/pipeline.py end-to-end host throughput (IO + remap +
CropResize + collate + device_put) on synthetic CT-sized cases, against the
train-step consumption rate at the measured 7.38 steps/s (b4 = 29.5
cases/s; the loader must sustain >= 2x to never gate the step).

Usage: python tools/probes/loader_throughput.py [size] [n_cases]
"""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from vae_segmentation_tpu.data.manifest import filedict_from_json  # noqa
from vae_segmentation_tpu.data.pipeline import CaseDataset, Loader  # noqa
from vae_segmentation_tpu.data.synthetic import write_synthetic_dataset  # noqa

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = int(sys.argv[2]) if len(sys.argv) > 2 else 24

root = tempfile.mkdtemp(prefix="loaderbench")
t0 = time.time()
manifest = write_synthetic_dataset(root, n_train=N, n_val=0, size=SIZE,
                                   seed=0)
print(f"wrote {N} cases of {SIZE}^3 int16 merge.npy in {time.time()-t0:.1f}s")

entries = filedict_from_json(manifest, "NIH_train")
ds = CaseDataset(entries, root, mask_index=[[[1], 1]],
                 output_size=(128, 128, 128))

# single-item cost split
t0 = time.time()
item = ds[0]
t_item = time.time() - t0
print(f"single item (cold): {t_item*1e3:.0f} ms")
t0 = time.time()
for i in range(4):
    ds[i % N]
print(f"single item (warm): {(time.time()-t0)/4*1e3:.0f} ms")

import os
ncpu = os.cpu_count() or 1
t0 = time.time()
n_serial = 8
for i in range(n_serial):
    ds[i % N]
per_item = (time.time() - t0) / n_serial
print(f"serial: {per_item*1e3:.0f} ms/item -> {1/per_item:.1f} cases/s/core "
      f"(host has {ncpu} core(s))")
need = 2 * 29.5  # 2x the b4 consumption at the measured 7.38 steps/s
cores_needed = need * per_item
print(f"cores to sustain 2x the b4 step rate ({need:.0f} cases/s): "
      f"{cores_needed:.1f} (linear worker scaling; the loader is "
      f"embarrassingly parallel per case)")
loader = Loader(ds, 8, shuffle=True, drop_last=True,
                num_workers=min(ncpu * 2, 16), prefetch=4)
n_items = 0
t0 = time.time()
for batch in loader:
    n_items += batch["image"].shape[0]
dt = time.time() - t0
print(f"threaded loader on this host: {n_items/dt:.1f} cases/s")
