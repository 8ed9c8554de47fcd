"""Probe: adaptation train-step wall time on the current device (see
BENCH.md measured-history table)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import Joint
from vae_segmentation_tpu.train import (AdaptConfig, default_sched, init_state, make_adapt_step, optim)
B,S = 4,128
rng = np.random.default_rng(0)
from vae_segmentation_tpu.models.blocks import use_s2d
fold = use_s2d()
model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5, folded_io=fold)
img = jnp.asarray(rng.normal(size=(B,S,S,S)), jnp.float32)
lab = jnp.asarray(rng.random((B,S,S,S))>0.9, jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, img[:1,...,None])["params"]
tx = optim.freeze_vae(optim.sgd(1e-3), params)
step = make_adapt_step(model, model, tx, AdaptConfig(n_class=2, domain_loss_type=8, folded=fold))
teacher = jax.tree.map(jnp.copy, params)
state = init_state(params, tx)
sched = default_sched(1.0); key = jax.random.PRNGKey(1)
t0=time.time(); state,mtr = step(state, teacher, img, lab, key, sched); float(mtr["dice_loss"])
print("compile+run", time.time()-t0, flush=True)
t0=time.time()
for i in range(6):
    state, mtr = step(state, teacher, img, lab, jax.random.fold_in(key,i), sched)
    float(mtr["dice_loss"])
print(f"adapt_step_b4: {(time.time()-t0)/6*1000:.1f} ms", flush=True)
print("DONE", flush=True)
