"""Headline benchmark: teacher-student domain-adaptation train-step
throughput per chip, at the reference's training configuration.

Config matched to the reference flagship recipe (scripts/target/domain_*.bash
-> main_target.py --method domain_adaptation): Joint student (SegUNet ~2.3M +
ShapeVAE ~15.4M params), frozen-VAE optimizer mask, teacher Joint forward,
pseudo-label binarize, dh loss schedule (domain_loss_type 8), SGD, batch 4 at
128^3 — the reference's global batch across its 4 default GPUs
(main_source.py:29,117; main_target.py:31), here on ONE chip.

Baseline for `vs_baseline`: the reference publishes no throughput numbers
(BASELINE.md). We use a measured proxy with recorded provenance: the
reference-equivalent torch train step, measured on this host via
tools/measure_torch_baseline.py, scaled by the measured torch-GPU/CPU factor
documented there. See BENCH.md for methodology.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compile cache: the remote-compile path costs ~10 min for the
# full train step at 128^3; cache it across bench runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
# Cache EVERY compile, not just >10s ones: through the tunnel each compile
# RPC costs seconds of wall time regardless of its local compile cost, and
# a cold bench process issues hundreds of tiny eager-op compiles — measured
# 2026-08-20: ~500 sub-10s MISSes accounted for most of an 18-min bench run
# while the big train step itself HIT the cache.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Reference-implementation baseline (see BENCH.md for provenance): the
# reference publishes no throughput numbers and its 4-GPU setup is not
# available here. We use an estimate of the reference's per-GPU step rate
# at the same global batch: its torch train step measured on THIS host's
# 64-core CPU is 123 s/step (tools/measure_torch_baseline.py, 2026-08-16);
# a V100-class GPU runs such conv3d workloads ~50-100x faster than host
# CPU, giving ~0.4-0.8 steps/s per GPU. We take the midpoint of that range
# spread over the reference's default 4 GPUs -> ~0.15 steps/s/GPU, and
# round UP to 0.5 steps/s/chip as a conservative single-accelerator
# baseline (favoring the reference).
BASELINE_STEPS_PER_SEC_PER_CHIP = 0.5

# Roofline constants (tools/probes/roofline.py, analytic; BENCH.md §roofline):
# logical math of the reference step vs executed grouped-tap FLOPs on the
# W-packed space-to-depth rep, against the v5e bf16 peak. MFU here is
# model-FLOPs utilization per second of wall step time.
LOGICAL_FLOP_PER_STEP = 2.58e12
GROUPED_FLOP_PER_STEP = 7.27e12
PEAK_BF16_FLOPS = 197e12

SIDE = 128
# headline stays at the reference's global batch 4; VAESEG_BENCH_BATCH
# overrides for scaling studies (BENCH.md batch-scaling table)
BATCH = int(os.environ.get("VAESEG_BENCH_BATCH", "4"))
WARMUP = 2
ITERS = 10


def build():
    from vae_segmentation_tpu.models import Joint
    from vae_segmentation_tpu.models.blocks import use_s2d
    from vae_segmentation_tpu.train import (
        AdaptConfig, default_sched, init_state, make_adapt_step, optim)

    fold = use_s2d()  # the trainer-equivalent folded pipeline on TPU
    # trunk_remat=False mirrors the trainer's policy at vae_mont_number=1:
    # the b4 128^3 step fits HBM without remat (BENCH.md)
    model = Joint(n_class=2, dim=128, vae_decoder_dropout=0.5,
                  folded_io=fold, trunk_remat=False)

    # All device setup under as few jits as possible: flax's model.init and
    # the per-leaf teacher copy run EAGERLY by default, dispatching hundreds
    # of tiny one-op compiles — each a multi-second RPC through the tunnel
    # (the dominant cost of a bench process, not the train-step compile).
    @jax.jit
    def init_all():
        init_img = jnp.zeros((1, SIDE, SIDE, SIDE, 1), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)},
                            init_img)["params"]
        return params, jax.tree.map(jnp.copy, params)

    params, teacher = init_all()
    tx = optim.freeze_vae(optim.sgd(1e-3), params)
    cfg = AdaptConfig(n_class=2, domain_loss_type=8, vae_mont_number=1,
                      folded=fold)
    step = make_adapt_step(model, model, tx, cfg)

    state = jax.jit(lambda p: init_state(p, tx))(params)  # one traced init
    sched = default_sched(lambda_vae=1.0)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(BATCH, SIDE, SIDE, SIDE)),
                        dtype=jnp.float32)
    label = jnp.asarray(rng.random((BATCH, SIDE, SIDE, SIDE)) > 0.9,
                        dtype=jnp.float32)
    if fold:
        # The trainer's ingest emits the space-to-depth rep (the fold
        # fuses into the augmentation gather there — cli/common
        # _train_ingest); the bench inputs arrive prefolded the same way.
        from vae_segmentation_tpu.models.blocks import stage_wpack
        from vae_segmentation_tpu.ops import s2d

        wp = stage_wpack(model.fmaps)

        @jax.jit
        def fold_inputs(img, lab):
            return (s2d.fold_rep(img[..., None], wp),
                    s2d.fold_rep(lab.astype(jnp.bfloat16)[..., None], wp))

        image, label = fold_inputs(image, label)
    return step, state, teacher, image, label, sched


def main():
    step, state, teacher, image, label, sched = build()
    key = jax.random.PRNGKey(1)

    # VAESEG_BENCH_TRACE=<dir>: also capture a jax.profiler device trace of
    # 3 steps after the timed region, in THIS process — the persistent
    # compile cache does not hit across processes through the axon tunnel
    # (each claim re-compiles ~15 min), so separate trace probes are
    # prohibitively slow.
    trace_dir = os.environ.get("VAESEG_BENCH_TRACE")

    # NOTE: through the axon tunnel block_until_ready does not reliably
    # block; a host transfer of a metric scalar is the sync point.
    for i in range(WARMUP):
        state, metrics = step(state, teacher, image, label,
                              jax.random.fold_in(key, i), sched)
        float(metrics["dice_loss"])

    # Timed region: dispatch all steps asynchronously (each step consumes the
    # previous state, so execution is strictly sequential on device) and sync
    # ONCE on the last step's metric — a per-step host sync would add a
    # ~30 ms tunnel round trip to every step, which is dispatch overhead of
    # this harness, not step cost. Training loops behave like this too: they
    # only fetch metrics at display_freq boundaries.
    all_metrics = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, teacher, image, label,
                              jax.random.fold_in(key, WARMUP + i), sched)
        all_metrics.append(metrics["dice_loss"])
    float(all_metrics[-1])
    dt = time.perf_counter() - t0
    assert all(np.isfinite(float(m)) for m in all_metrics)

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for i in range(3):
                state, metrics = step(state, teacher, image, label,
                                      jax.random.fold_in(key, 99 + i),
                                      sched)
                float(metrics["dice_loss"])

    value = ITERS / dt
    print(json.dumps({
        "metric": f"domain_adaptation_train_step_throughput_b{BATCH}"
                  "_128cubed",
        "value": round(value, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(value / BASELINE_STEPS_PER_SEC_PER_CHIP, 2),
        "mfu_logical": round(value * LOGICAL_FLOP_PER_STEP
                             / PEAK_BF16_FLOPS, 4),
        "mfu_grouped": round(value * GROUPED_FLOP_PER_STEP
                             / PEAK_BF16_FLOPS, 4),
    }))


if __name__ == "__main__":
    main()
