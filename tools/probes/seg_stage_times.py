"""Cumulative per-stage timings of SegUNet (s2d on) to locate remaining cost."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import SegUNet
from vae_segmentation_tpu.ops import s2d as s2d_ops

B,S = 4,128
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B,S,S,S,1)), jnp.float32)
seg = SegUNet(n_class=2, s2d=True)
params = seg.init({"params": jax.random.PRNGKey(0)}, img[:1])["params"]

def upto(n):
    def f(m, x):
        x = s2d_ops.fold(x)
        feats = [m.in_block(x)]
        stages = [m.down1, m.down2, m.down3, m.down4]
        for st in stages[:max(0, n-1)]:
            feats.append(st(feats[-1]))
        return feats[-1]
    return f

def bench(name, fn, iters=4):
    t0=time.time(); o=fn(); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): o=fn(); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    print(f"{name}: {(time.time()-t0)/iters*1000:.1f} ms (compile {c:.1f}s)", flush=True)

for n in range(1, 6):
    f = jax.jit(lambda p, x, n=n: seg.apply({"params": p}, x, method=upto(n)))
    bench(f"enc_upto{n}", lambda f=f: f(params, img))

full = jax.jit(lambda p, x: seg.apply({"params": p}, x))
bench("seg_full", lambda: full(params, img))
print("DONE", flush=True)
