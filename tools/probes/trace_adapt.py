"""Capture a jax.profiler device trace of the adaptation step (b4).

Reuses bench.py's build() verbatim so the jitted step is the EXACT graph
the headline bench compiles — the persistent compile cache then makes this
probe cheap after any bench run (a re-derived near-copy of the step missed
the cache and paid the full ~15 min remote compile twice, round 3)."""
import sys, glob, os
sys.path.insert(0, "/root/repo")
import jax

import bench

step, state, teacher, image, label, sched = bench.build()
key = jax.random.PRNGKey(1)
state, m = step(state, teacher, image, label, key, sched)
float(m["dice_loss"])
print("warm", flush=True)
os.makedirs("/root/repo/.trace_out", exist_ok=True)
with jax.profiler.trace("/root/repo/.trace_out"):
    for i in range(3):
        state, m = step(state, teacher, image, label,
                        jax.random.fold_in(key, i), sched)
        float(m["dice_loss"])
print("traced", flush=True)
print(glob.glob("/root/repo/.trace_out/**/*.trace.json.gz",
                recursive=True), flush=True)
