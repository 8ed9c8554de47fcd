from vae_segmentation_tpu.data.manifest import filedict_from_json  # noqa: F401
from vae_segmentation_tpu.data.transforms import (  # noqa: F401
    crop_resize,
    load_merge_case,
    parse_pan_index,
)
