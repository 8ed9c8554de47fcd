"""Roofline accounting for the flagship adaptation step (BENCH.md).

Compiles the EXACT folded production step (VAESEG_S2D=1) on the CPU backend
and reads XLA's own cost model: total FLOPs and HBM bytes accessed. From
those plus v5e peak numbers it derives the compute and bandwidth floors for
one step, so the 10x north star is an engineering budget, not a hope.

Usage: VAESEG_S2D=1 JAX_PLATFORMS=cpu python tools/probes/roofline.py
"""
import os
import sys

os.environ.setdefault("VAESEG_S2D", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vae_segmentation_tpu.models import Joint
from vae_segmentation_tpu.train import (
    AdaptConfig, default_sched, init_state, make_adapt_step, optim)

S, B = 128, 4

# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9

model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5, folded_io=True,
              trunk_remat=False)
img1 = jnp.zeros((1, S, S, S, 1), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, img1)["params"]
tx = optim.freeze_vae(optim.sgd(1e-3), params)
cfg = AdaptConfig(n_class=2, domain_loss_type=8, vae_mont_number=1,
                  folded=True)
step = make_adapt_step(model, model, tx, cfg)

teacher = jax.tree.map(jnp.copy, params)
state = init_state(params, tx)
sched = default_sched(1.0)
image = jnp.zeros((B, S, S, S), jnp.float32)
label = jnp.zeros((B, S, S, S), jnp.float32)
key = jax.random.PRNGKey(1)

lowered = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__") else step
                  ).lower(state, teacher, image, label, key, sched)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", float("nan"))
bytes_acc = ca.get("bytes accessed", float("nan"))
print(f"XLA cost model (folded production step, b{B} {S}^3):")
print(f"  flops          = {flops/1e12:.3f} TFLOP/step")
print(f"  bytes accessed = {bytes_acc/1e9:.3f} GB/step")
print(f"  compute floor  = {flops/PEAK_FLOPS*1e3:.1f} ms/step "
      f"({PEAK_FLOPS/1e12:.0f} TFLOP/s bf16 peak)")
print(f"  bandwidth floor= {bytes_acc/PEAK_BYTES*1e3:.1f} ms/step "
      f"({PEAK_BYTES/1e9:.0f} GB/s HBM)")
print(f"  arithmetic intensity = {flops/bytes_acc:.1f} FLOP/byte "
      f"(MXU ridge ~{PEAK_FLOPS/PEAK_BYTES:.0f})")
for t in (1/0.5, 1.92, 5.0, 10.0):
    ms = 1e3 / t
    print(f"  at {t:5.2f} steps/s: {ms:6.1f} ms/step -> "
          f"{flops/1e12/(ms/1e3)/ (PEAK_FLOPS/1e12)*100:5.1f}% of bf16 peak, "
          f"{bytes_acc/1e9/(ms/1e3)/(PEAK_BYTES/1e9)*100:5.1f}% of HBM peak")
