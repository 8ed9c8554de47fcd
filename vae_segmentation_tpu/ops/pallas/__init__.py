"""Pallas TPU kernels for the hot fused ops (BASELINE.json north star):

  instance_norm_act — fused InstanceNorm3d(+ReLU) with custom VJP
  reparam_kl        — fused VAE reparameterization + KL

Both fall back to interpret mode off-TPU, so the same code paths are
exercised by the CPU test suite. Model usage is opt-in via
models.blocks.use_pallas_norm() / the VAESEG_PALLAS env switch.
"""

from vae_segmentation_tpu.ops.pallas.instance_norm import instance_norm_act  # noqa: F401
from vae_segmentation_tpu.ops.pallas.reparam import reparam_kl  # noqa: F401
