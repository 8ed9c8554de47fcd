"""Probe: sliding-window full-volume inference throughput (vols/min)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import SegUNet
from vae_segmentation_tpu.eval.sliding_window import sliding_window_predict

rng = np.random.default_rng(0)
seg = SegUNet(n_class=2)
params = seg.init({"params": jax.random.PRNGKey(0)},
                  jnp.zeros((1,128,128,128,1)))["params"]
apply_fn = lambda p, x: seg.apply({"params": p}, x)
vol = jnp.asarray(rng.normal(size=(192, 224, 192)), jnp.float32)

t0=time.time()
probs = sliding_window_predict(apply_fn, params, vol, patch=(128,128,128),
                               overlap=0.5, batch=2, n_class=2)
s = float(jnp.sum(probs))
print("compile+first", time.time()-t0, flush=True)
t0=time.time(); n=5
for _ in range(n):
    probs = sliding_window_predict(apply_fn, params, vol, patch=(128,128,128),
                                   overlap=0.5, batch=2, n_class=2)
    s = float(jnp.sum(probs))
dt=(time.time()-t0)/n
print(f"sw_vol_192x224x192: {dt*1000:.0f} ms/vol = {60.0/dt:.1f} vols/min", flush=True)
print("DONE", flush=True)
