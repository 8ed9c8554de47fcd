from vae_segmentation_tpu.core import checkpoint  # noqa: F401
