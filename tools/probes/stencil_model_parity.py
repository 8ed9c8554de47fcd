"""On-TPU numerical parity of the stencil fast path: full Joint forward +
adapt-step metrics with VAESEG_STENCIL=1 vs 0 (same params, same rep)."""
import sys
sys.path.insert(0, "/root/repo")
import os
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from vae_segmentation_tpu.models import Joint
from vae_segmentation_tpu.models import blocks
from vae_segmentation_tpu.train import (AdaptConfig, default_sched,
                                        init_state, make_adapt_step, optim)

S, B = 32, 2
rng = np.random.default_rng(0)
os.environ["VAESEG_S2D"] = "1"
model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.0, folded_io=True,
              trunk_remat=False, bottleneck=256)
img1 = jnp.zeros((1, S, S, S, 1), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, img1)["params"]
image = jnp.asarray(rng.normal(size=(B, S, S, S)), jnp.float32)
label = jnp.asarray(rng.random((B, S, S, S)) > 0.9, jnp.float32)

tx = optim.freeze_vae(optim.sgd(1e-3), params)
cfg = AdaptConfig(n_class=2, domain_loss_type=8, folded=True)
sched = default_sched(1.0)
key = jax.random.PRNGKey(7)

outs = {}
for flag in ("1", "0"):
    os.environ["VAESEG_STENCIL"] = flag
    blocks.set_stencil_enabled(True)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    pred, recon, mean, std = fwd(params, image[..., None])
    print("fwd ok", flag, float(jnp.sum(pred.astype(jnp.float32))), flush=True)
    step = make_adapt_step(model, model, tx, cfg)
    step = jax.jit(step.__wrapped__)  # no donation: keep buffers for compare
    st, m = step(init_state(params, tx), params, image, label, key, sched)
    print("step ok", flag, float(m["dice_loss"]), flush=True)
    outs[flag] = (np.asarray(pred.astype(jnp.float32)),
                  np.asarray(recon.astype(jnp.float32)),
                  np.asarray(mean), {k: float(v) for k, v in m.items()},
                  jax.tree.leaves(st.params)[0])

p1, r1, m1, met1, w1 = outs["1"]
p0, r0, m0, met0, w0 = outs["0"]
print("pred  max|d|:", np.abs(p1 - p0).max())
print("recon max|d|:", np.abs(r1 - r0).max())
print("mean  max|d|:", np.abs(m1 - m0).max())
for k in met1:
    print(f"metric {k}: stencil={met1[k]:.6f} xla={met0[k]:.6f} "
          f"d={abs(met1[k]-met0[k]):.2e}")
# bf16 probabilities: different (exact) conv algorithms -> last-ulp
assert np.abs(p1 - p0).max() < 0.1, "pred mismatch"
assert np.abs(r1 - r0).max() < 0.1, "recon mismatch"
for k in met1:
    assert abs(met1[k] - met0[k]) < 5e-3, (k, met1[k], met0[k])
print("PARITY OK")
