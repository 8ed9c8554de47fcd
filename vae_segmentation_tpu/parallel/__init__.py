from vae_segmentation_tpu.parallel.sharding import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_params,
    replicated,
    shard_batch,
)
