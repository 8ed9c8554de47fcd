import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vae_segmentation_tpu.models import Joint
from vae_segmentation_tpu.models.blocks import use_s2d
from vae_segmentation_tpu.train import (AdaptConfig, default_sched, init_state, make_adapt_step, optim)
S=128; B=4; fold=use_s2d()
import os
remat = os.environ.get("TRACE_REMAT", "0") == "1"
model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5, folded_io=fold, trunk_remat=remat)
img1 = jnp.zeros((1,S,S,S,1), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, img1)["params"]
tx = optim.freeze_vae(optim.sgd(1e-3), params)
from vae_segmentation_tpu.train.steps import TrainState
import vae_segmentation_tpu.train.steps as steps_mod
step = make_adapt_step(model, model, tx, AdaptConfig(n_class=2, domain_loss_type=8, folded=fold))
teacher = params
st = init_state(params, tx)
sched = default_sched(1.0)
image = jnp.zeros((B,S,S,S), jnp.float32)
lab = jnp.zeros((B,S,S,S), jnp.float32)
lowered = step.lower(st, teacher, image, lab, jax.random.PRNGKey(1), sched)
compiled = lowered.compile()
txt = compiled.as_text()
open("/root/repo/.trace_out/adapt_hlo.txt","w").write(txt)
print("HLO dumped", len(txt))
