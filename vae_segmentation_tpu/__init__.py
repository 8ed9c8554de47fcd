"""vae_segmentation_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
VAE-shape-prior medical image segmentation.

Re-implements, TPU-first, the full capability surface of the reference
PyTorch research codebase (yyNoBug/VAE_segmentation — MIDL 2022,
"Unsupervised Domain Adaptation through Shape Modeling for Medical Image
Segmentation"):

  * a 3D conv shape VAE learning a prior over pancreas masks,
  * a 3D segmentation U-Net,
  * teacher-student unsupervised domain adaptation with pseudo-label Dice
    loss + VAE reconstruction loss, dynamic hyperparameters ("dh") and
    per-case test-time training ("ft1"),
  * the data pipeline (merge.npy + JSON manifest contract), recipes, and
    observability surface.

Design stance (NOT a port):
  * one functional core — pure, jit-compiled train-step functions over pytree
    state, sharded with `jax.sharding.NamedSharding` over a device mesh —
    replaces the reference's mutable-module + nn.DataParallel design
    (reference: main_source.py:354, main_target.py:436-438);
  * channels-last (NDHWC) conv layouts, bf16 matmul/conv compute with fp32
    normalization/softmax/loss accumulation;
  * device-side augmentation + ingest (affine warp, clip, center, one-hot)
    inside the compiled step, replacing 16-worker pinned DataLoaders;
  * Pallas kernels for hot fused ops; XLA collectives over ICI for scaling.
"""

__version__ = "0.1.0"
