from vae_segmentation_tpu.obs.saver import Saver, make_grid, mid_slice_panel  # noqa: F401
from vae_segmentation_tpu.obs.timing import StepTimer, profile_trace  # noqa: F401
