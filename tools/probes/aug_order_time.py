"""Probe: device-side augmentation ingest cost, order 1 (trilinear) vs the
reference's order 3 (cubic spline, IIR prefilter) — the step-rate side of
the round-3 verdict's augmentation-order question. Times the full
_train_ingest jit (spatial augment + intensity normalize + one-hot/fold)
at the flagship shape (b4, 144^3 source -> 128^3 patch, folded ingest),
plus the adaptation-step time for scale: ingest cost / step cost = the
throughput price of flipping the recipe default to order 3.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.cli.common import _train_ingest

_train_ingest = jax.jit(_train_ingest, static_argnums=(3, 4, 5, 6))

rng = np.random.default_rng(0)
SRC, PATCH, B = 144, (128, 128, 128), 4
image = jnp.asarray(rng.normal(size=(B, SRC, SRC, SRC)) * 200,
                    jnp.float32)
label = jnp.asarray(rng.random((B, SRC, SRC, SRC)) > 0.9, jnp.float32)


def bench(name, order, iters=10):
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    o = _train_ingest(image, label, key, PATCH, False, order, 2)
    jax.block_until_ready(o)
    float(jnp.sum(o[0].astype(jnp.float32)))
    c = time.time() - t0
    t0 = time.time()
    outs = None
    for i in range(iters):
        outs = _train_ingest(image, label, jax.random.fold_in(key, i),
                             PATCH, False, order, 2)
    float(jnp.sum(outs[0].astype(jnp.float32)))
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.2f} ms (compile {c:.1f}s)", flush=True)
    return ms


o1 = bench("ingest_order1_folded", 1)
o3 = bench("ingest_order3_folded", 3)
print(f"order3 - order1 = {o3 - o1:.2f} ms/batch "
      f"({(o3 - o1) / 73.2 * 100:.1f}% of the 73.2 ms adapt step)",
      flush=True)
print("DONE", flush=True)
