"""Probe: per-chip kernel cost of the flagship DP4xSP2 mesh vs single-chip.

Under DP4xSP2 each chip runs every folded stencil conv on its own shard:
batch 1, D-slab 32(+2 exchanged halo planes), dlim masking, stats with the
halo-plane correction, bd capped by the slab length (34 -> 2). This times
the hot W-packed 64^3-stage pre-conv (fwd and fwd+bwd) at

  - the single-chip workload      (B=4, D=64, no dlim)      [denominator]
  - the per-shard workload        (B=1, D=34, dlim=[1,32])  [numerator]

and prints the per-useful-plane time ratio: the kernel-level slowdown a
flagship-mesh chip pays vs the one-chip headline (BENCH.md round-4 mesh
policy table). ICI halo traffic itself is ~0.5 MB/conv/direction (~10 us
at v5e ICI rates, overlapped by XLA) and is not measurable on one chip.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.ops import s2d
from vae_segmentation_tpu.ops.pallas.stencil3 import conv3_stencil_folded_pre

rng = np.random.default_rng(0)


def bench(name, fn, *a, iters=20):
    t0 = time.time()
    o = fn(*a)
    float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    c = time.time() - t0
    t0 = time.time()
    outs = [fn(*a) for _ in range(iters)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].astype(jnp.float32)))
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.3f} ms (compile {c:.1f}s)", flush=True)
    return ms


C_ORIG = 8  # fmaps[0]: the W-packed 128^3 stage has 16*8 = 128 lanes
kf = jnp.asarray(rng.normal(size=(3, 3, 3, C_ORIG, C_ORIG)) * 0.1,
                 jnp.float32)
ke = s2d.expand_kernel_w(s2d.expand_kernel3_fast(kf)).astype(jnp.bfloat16)
bias = jnp.zeros((16 * C_ORIG,), jnp.float32)

results = {}
for tag, b_, d_, dlim in (("full_B4_D64", 4, 64, None),
                          ("shard_B1_D34", 1, 34, (1, 32)),
                          # the bd-aligned padded slab the round-4 wrap
                          # actually dispatches (blocks._pad_slab_bd):
                          # 34 -> 40 unlocks bd=8 instead of 2
                          ("shardpad_B1_D40", 1, 40, (1, 32))):
    x = jnp.asarray(rng.normal(size=(b_, d_, 64, 32, 128)), jnp.bfloat16)
    s = jnp.asarray(1 + 0.1 * rng.normal(size=(b_, 128)), jnp.float32)
    t = jnp.asarray(0.1 * rng.normal(size=(b_, 128)), jnp.float32)
    dl = None if dlim is None else jnp.asarray(dlim, jnp.int32)

    def fwd(x, s, t, k, b, dl=dl):
        return conv3_stencil_folded_pre(x, s, t, k, b, True, dl, True)

    results[tag + "_fwd"] = bench(tag + "_fwd", jax.jit(fwd), x, s, t, ke,
                                  bias)

    @jax.jit
    def fwdbwd(x, s, t, k):
        def loss(xx, ss, tt, kk):
            y, st = conv3_stencil_folded_pre(xx, ss, tt, kk, bias, True,
                                             dl, True)
            return (jnp.sum(y.astype(jnp.float32))
                    + 0.01 * jnp.sum(st[:, 1]))
        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, s, t, k)

    results[tag + "_fwdbwd"] = bench(tag + "_fwdbwd", fwdbwd, x, s, t, ke)

# per-useful-plane normalization: full = 4*64 planes, shard = 1*32 useful
for suf in ("fwd", "fwdbwd"):
    full = results[f"full_B4_D64_{suf}"] / (4 * 64)
    for stag in ("shard_B1_D34", "shardpad_B1_D40"):
        shard = results[f"{stag}_{suf}"] / (1 * 32)
        print(f"{suf} {stag}: per-useful-plane ratio vs full = "
              f"{shard / full:.3f}", flush=True)
print("DONE", flush=True)
