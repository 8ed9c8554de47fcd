"""Fused InstanceNorm3d(+ReLU) Pallas TPU kernels.

The reference's hot block is conv3^3 -> InstanceNorm3d -> ReLU repeated 3x per
stage (joint_model.py:35-52). The norm+act tail is HBM-bandwidth-bound
elementwise work over up-to-128^3 activations; these kernels do it in the
minimum number of HBM passes with fp32 statistics over bf16 data:

  forward:  1 read (fused sum+sumsq)  +  1 read/1 write (normalize+relu)
  backward: 1 read x/g (fused reduction) + 1 read/1 write (apply)

Layout trick for lane efficiency: activations are [B, S, C] with C in
{8,16,32,64} for most of the trunk — far below the 128-lane VPU width. When
C < 128 (and 128 % C == 0) the spatial-channel plane is viewed flat as
[B, S*C/128, 128]; each 128-lane row then holds 128/C complete channel
cycles (lane l belongs to channel l % C), so reductions use every lane and
the per-channel fold is a tiny (128/C, C) reshape-sum in the finalizer.
When C is a multiple of 128 the natural [S, C] blocking is already
lane-perfect.

Grid iteration on TPU is sequential, so per-image statistics accumulate in a
VMEM scratch across the spatial grid and are emitted on the last block.

All kernels run in interpret mode off-TPU (tests/test_pallas.py checks
numerical parity with the XLA reference implementation).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
LANES = 128
# spatial rows per block (sublane dim). 512 rows x 128 lanes x 4B = 256 KB.
ROWS = 512


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _stats_kernel(x_ref, stats_ref, acc_ref, *, ns: int, rows: int,
                  valid_rows: int):
    """Accumulate per-lane sum / sumsq over the spatial grid; emit on the
    last block. x block: [rows, LANES]; stats out: [2, LANES] per image."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # [rows, LANES]
    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)

    @pl.when(s == ns - 1)
    def _():
        stats_ref[0] = acc_ref[...]


def _apply_kernel(x_ref, scale_ref, shift_ref, o_ref, *, relu: bool):
    """o = [relu](x * scale + shift), scale/shift per lane ([1, LANES])."""
    x = x_ref[0].astype(jnp.float32)
    y = x * scale_ref[0] + shift_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _flatten_plan(shape: Tuple[int, ...]) -> Tuple[int, int, int, int]:
    """[B, *spatial, C] -> (B, n_rows, lanes, cycles) for the flat view.

    cycles = how many channel replicas live in one 128-lane row (1 when C is
    a multiple of 128)."""
    b, c = shape[0], shape[-1]
    s = math.prod(shape[1:-1])
    if c % LANES == 0:
        return b, s, c, 1
    assert LANES % c == 0, (
        f"channels {c}: need C % 128 == 0 or 128 % C == 0")
    total = s * c
    # flat view may need zero-padding to a whole number of 128-lane rows;
    # zeros are sum/sumsq-neutral and the fold divides by the true count
    return b, _cdiv(total, LANES), LANES, LANES // c


def _flat_view(x: jax.Array, b: int, r: int, lanes: int) -> jax.Array:
    """[B, *spatial, C] -> [B, r, lanes], zero-padding the flat tail."""
    flat = x.reshape(b, -1)
    need = r * lanes - flat.shape[1]
    if need:
        flat = jnp.pad(flat, ((0, 0), (0, need)))
    return flat.reshape(b, r, lanes)


def _unflatten(y: jax.Array, shape) -> jax.Array:
    b = shape[0]
    n = math.prod(shape[1:])
    return y.reshape(b, -1)[:, :n].reshape(shape)


def _per_lane_stats(x: jax.Array) -> jax.Array:
    """[B, R, L] -> [B, 2, L] per-lane (sum, sumsq) via the grid kernel."""
    b, r, lanes = x.shape
    rows = min(ROWS, r)
    ns = _cdiv(r, rows)
    pad_r = ns * rows
    valid_tail = r - (ns - 1) * rows
    if pad_r != r:
        x = jnp.pad(x, ((0, 0), (0, pad_r - r), (0, 0)))
    return pl.pallas_call(
        functools.partial(_stats_kernel, ns=ns, rows=rows,
                          valid_rows=valid_tail),
        grid=(b, ns),
        in_specs=[pl.BlockSpec((1, rows, lanes), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, lanes), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=_interpret(),
    )(x)


def _apply_per_lane(x: jax.Array, scale: jax.Array, shift: jax.Array,
                    relu: bool) -> jax.Array:
    """[B, R, L] x per-lane [B, L] affine (+relu)."""
    b, r, lanes = x.shape
    rows = min(ROWS, r)
    ns = _cdiv(r, rows)
    pad_r = ns * rows
    padded = jnp.pad(x, ((0, 0), (0, pad_r - r), (0, 0))) if pad_r != r else x
    out = pl.pallas_call(
        functools.partial(_apply_kernel, relu=relu),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, rows, lanes), lambda i, s: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pad_r, lanes), x.dtype),
        interpret=_interpret(),
    )(padded, scale[:, None, :], shift[:, None, :])
    return out[:, :r] if pad_r != r else out


def _fold_lane_stats(lane_stats: jax.Array, c: int, cycles: int,
                     n_spatial: int):
    """Per-lane (sum, sumsq) -> per-channel (mean, rstd).

    lane_stats: [B, 2, L]. With the flat view each channel owns `cycles`
    lanes (lane l -> channel l % C)."""
    b = lane_stats.shape[0]
    folded = lane_stats.reshape(b, 2, cycles, c).sum(axis=2)  # [B, 2, C]
    mean = folded[:, 0] / n_spatial
    var = folded[:, 1] / n_spatial - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + EPS)
    return mean, rstd


def _tile_to_lanes(per_channel: jax.Array, cycles: int) -> jax.Array:
    """[B, C] -> [B, L]: replicate channel params across their lanes."""
    if cycles == 1:
        return per_channel
    return jnp.tile(per_channel, (1, cycles))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_act(x: jax.Array, relu: bool = True) -> jax.Array:
    """Fused parameter-free InstanceNorm over spatial dims of
    [B, *spatial, C] (+ optional ReLU), fp32 statistics, custom VJP."""
    y, _ = _fwd(x, relu)
    return y


def _fwd(x: jax.Array, relu: bool):
    shape = x.shape
    b, r, lanes, cycles = _flatten_plan(shape)
    c = shape[-1]
    n_spatial = math.prod(shape[1:-1])
    xf = _flat_view(x, b, r, lanes)
    lane_stats = _per_lane_stats(xf)
    mean, rstd = _fold_lane_stats(lane_stats, c, cycles, n_spatial)
    scale = _tile_to_lanes(rstd, cycles)
    shift = _tile_to_lanes(-mean * rstd, cycles)
    y = _unflatten(_apply_per_lane(xf, scale, shift, relu), shape)
    return y, (x, mean, rstd)


def _bwd_stats_kernel(x_ref, g_ref, scale_ref, shift_ref, stats_ref, acc_ref,
                      *, ns: int, rows: int, valid_rows: int, relu: bool):
    """Accumulate per-lane sum(dxhat) and sum(dxhat * xhat)."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    xhat = x * scale_ref[0] + shift_ref[0]
    if relu:
        g = jnp.where(xhat > 0.0, g, 0.0)
    acc_ref[0, :] += jnp.sum(g, axis=0)
    acc_ref[1, :] += jnp.sum(g * xhat, axis=0)

    @pl.when(s == ns - 1)
    def _():
        stats_ref[0] = acc_ref[...]


def _bwd_apply_kernel(x_ref, g_ref, scale_ref, shift_ref, m1_ref, m2_ref,
                      o_ref, *, relu: bool):
    """dx = rstd * (dxhat - m1 - xhat * m2); scale/shift give xhat, rstd is
    scale (per lane)."""
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    xhat = x * scale_ref[0] + shift_ref[0]
    if relu:
        g = jnp.where(xhat > 0.0, g, 0.0)
    dx = scale_ref[0] * (g - m1_ref[0] - xhat * m2_ref[0])
    o_ref[0] = dx.astype(o_ref.dtype)


def _bwd(relu: bool, residuals, gy: jax.Array):
    x, mean, rstd = residuals
    shape = x.shape
    b, r, lanes, cycles = _flatten_plan(shape)
    c = shape[-1]
    n_spatial = math.prod(shape[1:-1])
    rows = min(ROWS, r)
    ns = _cdiv(r, rows)
    pad_r = ns * rows
    valid_tail = r - (ns - 1) * rows

    xf = _flat_view(x, b, r, lanes)
    gf = _flat_view(gy, b, r, lanes)
    if pad_r != r:
        xf = jnp.pad(xf, ((0, 0), (0, pad_r - r), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, pad_r - r), (0, 0)))

    scale = _tile_to_lanes(rstd, cycles)[:, None, :]
    shift = _tile_to_lanes(-mean * rstd, cycles)[:, None, :]

    lane_spec = pl.BlockSpec((1, 1, lanes), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    blk_spec = pl.BlockSpec((1, rows, lanes), lambda i, s: (i, s, 0),
                            memory_space=pltpu.VMEM)

    gsums = pl.pallas_call(
        functools.partial(_bwd_stats_kernel, ns=ns, rows=rows,
                          valid_rows=valid_tail, relu=relu),
        grid=(b, ns),
        in_specs=[blk_spec, blk_spec, lane_spec, lane_spec],
        out_specs=pl.BlockSpec((1, 2, lanes), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=_interpret(),
    )(xf, gf, scale, shift)

    folded = gsums.reshape(b, 2, cycles, c).sum(axis=2) / n_spatial  # [B,2,C]
    m1 = _tile_to_lanes(folded[:, 0], cycles)[:, None, :]
    m2 = _tile_to_lanes(folded[:, 1], cycles)[:, None, :]

    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, relu=relu),
        grid=(b, ns),
        in_specs=[blk_spec, blk_spec, lane_spec, lane_spec, lane_spec,
                  lane_spec],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((b, pad_r, lanes), x.dtype),
        interpret=_interpret(),
    )(xf, gf, scale, shift, m1, m2)
    dx = dx[:, :r] if pad_r != r else dx
    return (_unflatten(dx, shape),)


instance_norm_act.defvjp(_fwd, _bwd)
