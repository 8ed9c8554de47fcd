"""Probe: production Pallas stencil conv (stencil3.py) vs XLA conv at the
folded trunk hot shapes, fwd and fwd+bwd."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.ops.pallas.stencil3 import conv3_stencil

rng = np.random.default_rng(0)

def bench(name, fn, *a, iters=10):
    t0=time.time(); o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    outs=[fn(*a) for _ in range(iters)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.2f} ms (compile {c:.1f}s)", flush=True)

def xla_conv(x,k,b):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1,1,1), "SAME",
        dimension_numbers=("NDHWC","DHWIO","NDHWC")) + b.astype(x.dtype)

for (B,D,H,W,C,CO) in [(4,32,32,32,128,128),   # stage-1 folded direct
                       (4,64,64,32,128,128),   # 64^3 stage, w-packed
                       (4,64,64,32,32,128),    # VAE in_block, w-packed
                       (4,64,64,32,128,32)]:   # out head, w-packed
    x = jnp.asarray(rng.normal(size=(B,D,H,W,C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3,3,3,C,CO))*0.05, jnp.bfloat16)
    b = jnp.zeros((CO,), jnp.float32)
    bench(f"pallas_{D}x{H}x{W}_{C}to{CO}_fwd", jax.jit(lambda x,k,b: conv3_stencil(x,k,b)), x, k, b)
    bench(f"xla_{D}x{H}x{W}_{C}to{CO}_fwd", jax.jit(xla_conv), x, k, b)
    def make_grad(conv):
        @jax.jit
        def g(x,k,b):
            def loss(xx, kk):
                return jnp.sum(conv(xx, kk, b).astype(jnp.float32))
            return jax.grad(loss, argnums=(0,1))(x, k)
        return g
    bench(f"pallas_{D}x{H}x{W}_{C}to{CO}_fwdbwd", make_grad(conv3_stencil), x, k, b)
    bench(f"xla_{D}x{H}x{W}_{C}to{CO}_fwdbwd", make_grad(xla_conv), x, k, b)
print("DONE", flush=True)
