#!/usr/bin/env python
"""Target-domain trainer CLI — drop-in equivalent of the reference's
main_target.py (the scripts/target/*.bash recipes run unchanged).

VAESEG_PLATFORM=cpu|tpu overrides the JAX platform (useful for running
recipes on the host while the TPU is busy, and in CI)."""

import os

if os.environ.get("VAESEG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VAESEG_PLATFORM"])

from vae_segmentation_tpu.cli.target_main import main

if __name__ == "__main__":
    main()
