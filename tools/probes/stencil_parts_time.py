"""Per-component timing of the grouped stencil conv at the production
shapes: forward, dx (flipped-kernel conv), dk (grouped accumulate), and the
XLA norm+relu pass it pairs with — decides the next optimization lever."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.ops.pallas import stencil3 as st
from vae_segmentation_tpu.ops import s2d

rng = np.random.default_rng(0)

def bench(name, fn, *a, iters=12):
    o = fn(*a); jax.tree.map(lambda t: t.block_until_ready(), o)
    float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    t0 = time.time()
    outs = [fn(*a) for _ in range(iters)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.2f} ms", flush=True)

# flagship up5-DC shapes (w-packed 64^3 stage), b4
for (B, D, H, W, CI, CO, wp) in [(4, 64, 64, 32, 256, 128, True),
                                 (4, 64, 64, 32, 128, 128, True),
                                 (4, 32, 32, 32, 128, 128, False)]:
    x = jnp.asarray(rng.normal(size=(B, D, H, W, CI)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(B, D, H, W, CO)), jnp.bfloat16)
    c = CI // (16 if wp else 8)
    co = CO // (16 if wp else 8)
    k = jnp.asarray(rng.normal(size=(3, 3, 3, c, co)) * 0.1, jnp.float32)
    ke = s2d.expand_kernel3_fast(k)
    if wp:
        ke = s2d.expand_kernel_w(ke)
    ke = ke.astype(jnp.bfloat16)
    kg = st.pack_grouped(ke)
    b = jnp.zeros((CO,), jnp.float32)
    tag = f"{D}x{H}x{W}_{CI}to{CO}"
    bench(f"fwd_{tag}", jax.jit(
        lambda x, kg, b: st._run_conv_grouped(x, kg, b, False, c, wp)),
        x, kg, b)
    kt = jnp.flip(ke, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    kgt = st.pack_grouped(kt)
    b2 = jnp.zeros((CI,), jnp.float32)
    bench(f"dx_{tag}", jax.jit(
        lambda g, kgt, b2: st._run_conv_grouped(g, kgt, b2, False, co, wp)),
        g, kgt, b2)
    bench(f"dk_{tag}", jax.jit(
        lambda x, g: st._run_dk_grouped(x, g, c, wp)), x, g)
    # the paired norm+relu XLA pass at this size
    bench(f"norm_relu_{tag}", jax.jit(
        lambda y: jnp.maximum(s2d.instance_norm_folded(y, co), 0)), g)
print("DONE", flush=True)
