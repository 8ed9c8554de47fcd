"""Current seg fwd/bwd + batch scaling of the adaptation step."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import Joint, SegUNet
from vae_segmentation_tpu.models.blocks import use_s2d
from vae_segmentation_tpu.ops import losses as L
from vae_segmentation_tpu.train import (AdaptConfig, default_sched, init_state, make_adapt_step, optim)

S = 128
rng = np.random.default_rng(0)
fold = use_s2d()

seg = SegUNet(n_class=2)
img4 = jnp.asarray(rng.normal(size=(4,S,S,S,1)), jnp.float32)
segp = seg.init({"params": jax.random.PRNGKey(0)}, img4[:1])["params"]
def bench(name, fn, *a, iters=4):
    t0=time.time(); o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32))); c=time.time()-t0
    t0=time.time()
    for _ in range(iters): o=fn(*a); float(jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))
    dt=(time.time()-t0)/iters
    print(f"{name}: {dt*1000:.1f} ms (compile {c:.1f}s)", flush=True)
    return dt
bench("seg_fwd_b4_now", jax.jit(lambda p,x: seg.apply({"params":p},x)), segp, img4)

def adapt(bsz, comp):
    model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5,
                  folded_io=fold, composite_remat=comp)
    params = model.init({"params": jax.random.PRNGKey(0)}, img4[:1])["params"]
    tx = optim.freeze_vae(optim.sgd(1e-3), params)
    step = make_adapt_step(model, model, tx,
                           AdaptConfig(n_class=2, domain_loss_type=8, folded=fold))
    teacher = jax.tree.map(jnp.copy, params)
    st = init_state(params, tx)
    sched = default_sched(1.0); key = jax.random.PRNGKey(1)
    image = jnp.asarray(rng.normal(size=(bsz,S,S,S)), jnp.float32)
    lab = jnp.asarray(rng.random((bsz,S,S,S))>0.9, jnp.float32)
    try:
        t0=time.time(); st, m = step(st, teacher, image, lab, key, sched); float(m["dice_loss"])
        print(f"b{bsz} comp={comp} compile+run {time.time()-t0:.1f}s", flush=True)
        t0=time.time(); n=4
        for i in range(n):
            st, m = step(st, teacher, image, lab, jax.random.fold_in(key,i), sched)
            float(m["dice_loss"])
        dt=(time.time()-t0)/n
        print(f"adapt_b{bsz}_comp{int(comp)}: {dt*1000:.0f} ms = {bsz/dt:.2f} samples/s", flush=True)
    except Exception as e:
        print(f"adapt_b{bsz}_comp{int(comp)} FAILED: {str(e)[:150]}", flush=True)

adapt(8, False)
adapt(8, True)
print("DONE", flush=True)
