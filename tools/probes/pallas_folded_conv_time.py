"""Probe: Pallas stencil conv vs XLA conv at the FOLDED trunk shapes
(the round-2 hot spots per the trace: tap-expanded copies around the
[4,64,64,64,64] in_block stage and [4,32,32,32,128] stage-1 convs)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.ops.pallas.conv3 import conv3_pallas

rng = np.random.default_rng(0)

def bench(name, fn, *a, iters=8):
    t0=time.time(); o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    # async dispatch, single sync
    t0=time.time()
    outs=[fn(*a) for _ in range(iters)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.1f} ms (compile {c:.1f}s)", flush=True)

for (B,S,C) in [(4,64,64), (4,32,128)]:
    x = jnp.asarray(rng.normal(size=(B,S,S,S,C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3,3,3,C,C))*0.05, jnp.float32)
    b = jnp.zeros((C,), jnp.float32)
    f_pal = jax.jit(lambda x,k,b: conv3_pallas(x,k,b,True))
    bench(f"pallas_{S}cube_c{C}_fwd", f_pal, x, k, b)
    f_xla = jax.jit(lambda x,k,b: jnp.maximum(jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1,1,1), "SAME",
        dimension_numbers=("NDHWC","DHWIO","NDHWC")) + b.astype(jnp.bfloat16), 0))
    bench(f"xla_{S}cube_c{C}_fwd", f_xla, x, k, b)

    def make_grad(conv):
        @jax.jit
        def g(x,k,b):
            def loss(xx, kk):
                y = conv(xx, kk, b)
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(loss, argnums=(0,1))(x, k)
        return g
    g_pal = make_grad(lambda x,k,b: conv3_pallas(x,k,b,True))
    bench(f"pallas_{S}cube_c{C}_fwdbwd", g_pal, x, k, b)
    g_xla = make_grad(lambda x,k,b: jnp.maximum(jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1,1,1), "SAME",
        dimension_numbers=("NDHWC","DHWIO","NDHWC")) + b.astype(jnp.bfloat16), 0))
    bench(f"xla_{S}cube_c{C}_fwdbwd", g_xla, x, k, b)
print("DONE", flush=True)
