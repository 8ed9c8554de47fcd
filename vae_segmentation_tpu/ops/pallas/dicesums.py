"""Fused multi-target soft-Dice statistics kernel.

The adaptation loss computes THREE soft Dices of the student prediction
against three same-shaped volumes (VAE reconstruction, teacher pseudo
label, ground-truth one-hot — /root/reference/main_target.py:543-546).
Lowered naively, XLA materializes an f32 copy of the full-resolution
prediction (268 MB at b4 128^3) shared by the convert->multiply->reduce
fusions and walks the volumes once per pair — ~6 ms/step of the round-3
trace's fusion pool.

This kernel reads each volume exactly ONCE and emits every reduction the
three Dices need as one [B, 8, L] f32 block:

    row 0        sum(pred)
    row 1 + 2k   sum(target_k)
    row 2 + 2k   sum(pred * target_k)      (k = 0..K-1, K <= 3)

Inputs arrive as [B, D, H, L] with L = W * C_lanes — the caller collapses
the (W, lane) axes OUTSIDE the kernel (a free bitcast there; an illegal
lane-dim shape cast inside — see the stencil3.py design note). Per-class
sums fall out afterwards by reshaping the tiny [B, 8, L] result, since the
collapse keeps the class axis minor.

Custom VJP: d sum(pred)/d pred = 1, d sum(p*t)/d p = t — pure broadcasts,
left to XLA as one elementwise pass over tensors the backward reads anyway.

Parity: tests/test_pallas.py (interpret mode vs a jnp oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(*refs, k: int, bd: int):
    in_refs, o_ref = refs[:1 + k], refs[1 + k]

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    p = in_refs[0][0].astype(jnp.float32)          # [bd, H, L]
    o_ref[0, 0, :] += jnp.sum(p, axis=(0, 1))
    for i in range(k):
        t = in_refs[1 + i][0].astype(jnp.float32)
        o_ref[0, 1 + 2 * i, :] += jnp.sum(t, axis=(0, 1))
        o_ref[0, 2 + 2 * i, :] += jnp.sum(p * t, axis=(0, 1))


def _pick_bd(d: int, h: int, el: int, n_in: int) -> int:
    budget = 24 * 1024 * 1024
    for bd in (8, 4, 2):
        if d % bd == 0 and 2 * n_in * bd * h * el * 2 <= budget:
            return bd
    return 1


def _run(pred: jax.Array, targets) -> jax.Array:
    b, d, h, el = pred.shape
    k = len(targets)
    bd = _pick_bd(d, h, el, 1 + k)
    spec = pl.BlockSpec((1, bd, h, el), lambda bi, i: (bi, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, bd=bd),
        grid=(b, d // bd),
        in_specs=[spec] * (1 + k),
        out_specs=pl.BlockSpec((1, 8, el), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, el), jnp.float32),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(pred, *targets)


def _run_mesh(pred: jax.Array, targets) -> jax.Array:
    """Mesh-safe dispatch: under the active ('data','spatial') mesh the
    kernel runs PER SHARD via shard_map — batch splits over 'data' (the sums
    are per-batch-element), the D axis splits over 'spatial' with each shard
    emitting partial slab sums that one tiny [B,8,L] `psum` completes. An
    opaque pallas_call would instead make GSPMD all-gather the four
    full-resolution loss volumes every step (round-3 verdict, Missing #1).
    Shapes that don't divide the mesh (ragged eval batches, per-case ft1)
    fall back to the unwrapped op, like blocks.stencil_shard_wrap."""
    from vae_segmentation_tpu.models.blocks import get_stencil_mesh

    mesh = get_stencil_mesh()
    if mesh is None:
        return _run(pred, targets)
    n_data = mesh.shape["data"]
    n_sp = mesh.shape.get("spatial", 1)
    if pred.shape[0] % n_data != 0 or pred.shape[1] % n_sp != 0:
        return _run(pred, targets)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def inner(p, *ts):
        s = _run(p, ts)
        if n_sp > 1:
            s = jax.lax.psum(s, "spatial")
        return s

    return shard_map(
        inner, mesh=mesh,
        in_specs=(P("data", "spatial"),) * (1 + len(targets)),
        out_specs=P("data"), check_vma=False)(pred, *targets)


@jax.custom_vjp
def dice_sums(pred: jax.Array, *targets: jax.Array) -> jax.Array:
    """pred, targets: [B, D, H, L] (L = lane-collapsed W*C, any dtype) ->
    [B, 8, L] f32 sums (row layout in the module docstring)."""
    return _run_mesh(pred, targets)


def _fwd(pred, *targets):
    return _run_mesh(pred, targets), (pred, targets)


def _bwd(res, g):
    pred, targets = res
    g = g.astype(jnp.float32)
    gp = g[:, 0][:, None, None, :]
    dp = gp
    dts = []
    for i, t in enumerate(targets):
        gt = g[:, 1 + 2 * i][:, None, None, :]
        gi = g[:, 2 + 2 * i][:, None, None, :]
        dp = dp + gi * t.astype(jnp.float32)
        dts.append((gt + gi * pred.astype(jnp.float32)).astype(t.dtype))
    return (dp.astype(pred.dtype), *dts)


dice_sums.defvjp(_fwd, _bwd)


def multi_soft_dice(pred: jax.Array, targets, n_class: int,
                    eps: float):
    """Per-class soft Dice of pred against each target, all volumes read
    once. pred/targets: [B, D, H, W, P*C] folded reps (or 6D [..., P, C]
    class views — trailing axes are collapsed). Returns a list of [B, C]
    f32 Dice arrays matching ops.losses.soft_dice_per_class's formula
    2*inter / (sum_a + sum_b + eps)."""
    b, d, h = pred.shape[:3]
    flat = [x.reshape(b, d, h, -1) for x in (pred, *targets)]
    el = flat[0].shape[-1]
    sums = dice_sums(*flat)                                # [B, 8, L]
    # L = W * P * C with the class axis minor: per-class totals
    per = jnp.sum(sums.reshape(b, 8, el // n_class, n_class), axis=2)
    out = []
    for i in range(len(targets)):
        inter = per[:, 2 + 2 * i]
        denom = per[:, 0] + per[:, 1 + 2 * i]
        out.append(2.0 * inter / (denom + eps))
    return out
