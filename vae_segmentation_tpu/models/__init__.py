from vae_segmentation_tpu.models.blocks import (  # noqa: F401
    DEFAULT_FMAPS,
    ConvNormAct,
    DoubleConv,
    Down,
    Norm,
    OutConv,
    Up,
    gs_norm,
    instance_norm,
)
from vae_segmentation_tpu.models.encoder import ShapeEncoder  # noqa: F401
from vae_segmentation_tpu.models.fusion import FusionNet  # noqa: F401
from vae_segmentation_tpu.models.joint import Embed, Joint, Joint2  # noqa: F401
from vae_segmentation_tpu.models.unet import SegUNet  # noqa: F401
from vae_segmentation_tpu.models.vae import ShapeVAE  # noqa: F401
