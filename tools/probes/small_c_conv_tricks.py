"""Probe: lane-padding workarounds for small-channel 3D convs (cf. BENCH.md):
(a) plain NDHWC conv (the XLA default the models hit today)
(b) batch folded into channels via feature_group_count
(c) conv as 27 shifted dot_generals on channels-last views
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B,S,C = 4,128,8
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B,S,S,S,C)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(3,3,3,C,C))*0.1, jnp.bfloat16)

def bench(name, fn, *a, iters=6):
    t0=time.time(); o=fn(*a); float(jnp.sum(o.astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): o=fn(*a); float(jnp.sum(o.astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.1f} ms (compile {c:.1f}s)", flush=True)

@jax.jit
def conv_plain(x, k):
    return jax.lax.conv_general_dilated(x, k, (1,1,1), "SAME",
        dimension_numbers=("NDHWC","DHWIO","NDHWC"))

@jax.jit
def conv_grouped(x, k):
    xg = jnp.transpose(x, (1,2,3,0,4)).reshape(1, S, S, S, B*C)
    kg = jnp.tile(k, (1,1,1,1,B))
    return jax.lax.conv_general_dilated(xg, kg, (1,1,1), "SAME",
        feature_group_count=B,
        dimension_numbers=("NDHWC","DHWIO","NDHWC"))

@jax.jit
def conv_tap_matmul(x, k):
    xp = jnp.pad(x, ((0,0),(1,1),(1,1),(1,1),(0,0)))
    y = jnp.zeros(x.shape, jnp.float32)
    for dd in range(3):
        for dh in range(3):
            for dw in range(3):
                xs = jax.lax.dynamic_slice(xp, (0,dd,dh,dw,0), x.shape)
                y = y + jax.lax.dot_general(xs, k[dd,dh,dw],
                        (((4,),(0,)), ((),())),
                        preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)

bench("conv_plain", conv_plain, x, k)
bench("conv_grouped_bfold", conv_grouped, x, k)
bench("conv_tap_matmul", conv_tap_matmul, x, k)
print("DONE", flush=True)
