"""Device mesh + sharding plans — the framework's entire distribution story.

The reference's only parallelism is single-process nn.DataParallel
(main_source.py:354; SURVEY.md section 2.2). The TPU-native replacement:

  * a `Mesh` with axes ('data', 'spatial');
  * batch dim sharded over 'data' (DP): the gradient all-reduce is the psum
    XLA inserts when differentiating a sharded-batch loss — no NCCL, no
    host-side gather;
  * optionally the volume's D axis sharded over 'spatial' (the SP/CP analog
    for dense 3D volumes, SURVEY.md section 2.2): XLA's SPMD partitioner
    inserts the halo exchanges 3^3 convs need over ICI collectives
    automatically;
  * params replicated (they are ~18M params total — replication is free
    relative to a 128^3 activation footprint).

Everything here also runs on a virtual CPU mesh
(--xla_force_host_platform_device_count) for testing.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'spatial') mesh. Defaults: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (n_data, n_spatial, len(devices))
    grid = np.array(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, shard_spatial: bool = False) -> NamedSharding:
    """[B, D, H, W(, C)] batch: B over 'data', optionally D over 'spatial'."""
    if shard_spatial:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, shard_spatial: bool = False):
    """device_put a host batch dict's arrays with the batch sharding."""
    sh = batch_sharding(mesh, shard_spatial)
    return {
        k: jax.device_put(v, sh) if k in ("image", "label", "pseudo") else v
        for k, v in batch.items()
    }


def replicate_params(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


