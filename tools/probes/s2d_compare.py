import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import SegUNet, ShapeVAE
from vae_segmentation_tpu.ops import losses as L

B,S = 4,128
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B,S,S,S,1)), jnp.float32)
lab = jnp.asarray(rng.random((B,S,S,S))>0.9, jnp.float32)
onehot = jax.nn.one_hot(lab.astype(jnp.int32), 2, dtype=jnp.bfloat16)

def bench(name, fn, *args, iters=4):
    t0=time.time(); o=fn(*args)
    float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    for _ in range(iters):
        o=fn(*args); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.1f} ms (compile {c:.1f}s)", flush=True)

for s2d in (False, True):
    seg = SegUNet(n_class=2, s2d=s2d)
    segp = seg.init({"params": jax.random.PRNGKey(0)}, img[:1])["params"]
    bench(f"seg_fwd_s2d{int(s2d)}", jax.jit(lambda p,x: seg.apply({"params":p},x)), segp, img)
    def loss(p, x, oh):
        pred = seg.apply({"params": p}, x)
        return 1.0 - L.avg_dsc(pred, oh, botindex=1, topindex=2)
    bench(f"seg_bwd_s2d{int(s2d)}", jax.jit(jax.grad(loss)), segp, img, onehot)
    vae = ShapeVAE(n_class=2, dim=128, s2d=s2d)
    vaep = vae.init({"params": jax.random.PRNGKey(0)}, onehot[:1])["params"]
    bench(f"vae_fwd_s2d{int(s2d)}", jax.jit(lambda p,x: vae.apply({"params":p},x,False,0.0,False,0.0)), vaep, onehot)
print("DONE", flush=True)
