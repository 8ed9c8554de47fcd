"""Probe: Pallas lane-packed conv3 vs XLA conv at real shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.ops.pallas.conv3 import conv3_pallas

B,S = 4,128
rng = np.random.default_rng(0)

def bench(name, fn, *a, iters=6):
    t0=time.time(); o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.1f} ms (compile {c:.1f}s)", flush=True)

for cin, cout in [(8,8), (16,8)]:
    x = jnp.asarray(rng.normal(size=(B,S,S,S,cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3,3,3,cin,cout))*0.1, jnp.float32)
    b = jnp.zeros((cout,), jnp.float32)
    f_pal = jax.jit(lambda x,k,b: conv3_pallas(x,k,b,True))
    bench(f"pallas_conv_{cin}to{cout}", f_pal, x, k, b)
    f_xla = jax.jit(lambda x,k,b: jnp.maximum(jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1,1,1), "SAME",
        dimension_numbers=("NDHWC","DHWIO","NDHWC")) + b.astype(jnp.bfloat16), 0))
    bench(f"xla_conv_{cin}to{cout}", f_xla, x, k, b)

# chained (3 convs like DoubleConv) to check inter-kernel layout stability
x = jnp.asarray(rng.normal(size=(B,S,S,S,8)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(3,3,3,8,8))*0.1, jnp.float32)
b = jnp.zeros((8,), jnp.float32)
@jax.jit
def chain_pal(x,k,b):
    for _ in range(3): x = conv3_pallas(x,k,b,True)
    return x
bench("pallas_chain3", chain_pal, x, k, b)
# grad of chain
@jax.jit
def g_pal(x,k,b):
    return jax.grad(lambda xx: jnp.sum(chain_pal(xx,k,b).astype(jnp.float32)))(x)
bench("pallas_chain3_grad", g_pal, x, k, b)
@jax.jit
def chain_xla(x,k,b):
    kb = k.astype(jnp.bfloat16)
    for _ in range(3):
        x = jnp.maximum(jax.lax.conv_general_dilated(x, kb, (1,1,1), "SAME",
            dimension_numbers=("NDHWC","DHWIO","NDHWC")) + b.astype(jnp.bfloat16), 0)
    return x
bench("xla_chain3", chain_xla, x, k, b)
@jax.jit
def g_xla(x,k,b):
    return jax.grad(lambda xx: jnp.sum(chain_xla(xx,k,b).astype(jnp.float32)))(x)
bench("xla_chain3_grad", g_xla, x, k, b)
print("DONE", flush=True)
