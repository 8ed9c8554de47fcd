"""Capture a jax.profiler device trace of the adaptation step (b4)."""
import sys, time, glob, os
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vae_segmentation_tpu.models import Joint
from vae_segmentation_tpu.models.blocks import use_s2d
from vae_segmentation_tpu.train import (AdaptConfig, default_sched, init_state, make_adapt_step, optim)
S=128; B=4; rng=np.random.default_rng(0); fold=use_s2d()
import os as _os
remat = _os.environ.get("TRACE_REMAT", "0") == "1"
model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5, folded_io=fold,
              trunk_remat=remat)
img1 = jnp.zeros((1,S,S,S,1), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, img1)["params"]
tx = optim.freeze_vae(optim.sgd(1e-3), params)
step = make_adapt_step(model, model, tx, AdaptConfig(n_class=2, domain_loss_type=8, folded=fold))
teacher = jax.tree.map(jnp.copy, params)
st = init_state(params, tx)
sched = default_sched(1.0); key = jax.random.PRNGKey(1)
image = jnp.asarray(rng.normal(size=(B,S,S,S)), jnp.float32)
lab = jnp.asarray(rng.random((B,S,S,S))>0.9, jnp.float32)
st, m = step(st, teacher, image, lab, key, sched); float(m["dice_loss"])
print("warm", flush=True)
os.makedirs("/root/repo/.trace_out", exist_ok=True)
with jax.profiler.trace("/root/repo/.trace_out"):
    for i in range(3):
        st, m = step(st, teacher, image, lab, jax.random.fold_in(key,i), sched)
        float(m["dice_loss"])
print("traced", flush=True)
print(glob.glob("/root/repo/.trace_out/**/*", recursive=True), flush=True)
