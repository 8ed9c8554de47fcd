"""Fused class-group softmax VJP kernel.

The fused conv+softmax heads (stencil3.conv3_stencil_folded_softmax[_pre])
save bf16 probabilities y and compute the softmax cotangent in their
backward:

    dacc = (g - (g*y) @ Gmat) * y        (Gmat = class-group 0/1 matrix)

Lowered in XLA this is a full-resolution f32 chain (convert g and y to f32,
multiply, a [.., FC] x [FC, FC] dot the TPU backend routes through the conv
emitter, subtract, multiply, convert) — 2.0 + 0.95 ms/step for the two
student heads in the round-4 trace (fusion.97/93). This kernel reads g and
y once in bf16, runs the tiny group-sum as an in-VMEM MXU GEMM per plane
block, and writes bf16 dacc: pure HBM-bound, ~0.2 ms for both sites.

No custom VJP: this op IS a backward-pass computation.
Parity: tests/test_pallas.py (interpret mode vs the jnp chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(g_ref, y_ref, gm_ref, o_ref, *, bd: int, h: int, w: int,
            fc: int):
    for j in range(bd):
        g32 = g_ref[0, j].reshape(h * w, fc).astype(jnp.float32)
        y32 = y_ref[0, j].reshape(h * w, fc).astype(jnp.float32)
        gy = jax.lax.dot_general(g32 * y32, gm_ref[...],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, j] = ((g32 - gy) * y32).astype(o_ref.dtype).reshape(h, w,
                                                                     fc)


def _pick_bd(d: int, h: int, w: int, fc: int) -> int:
    budget = 24 * 1024 * 1024
    for bd in (8, 4, 2):
        if d % bd == 0 and 2 * 3 * bd * h * w * fc * 2 <= budget:
            return bd
    return 1


def softmax_group_vjp(g: jax.Array, y: jax.Array, n_class: int) -> jax.Array:
    """dacc = (g - sum_over_class_group(g*y)) * y, groups of n_class over
    the last axis (class minor — the folded softmax layout). g, y:
    [B, D, H, W, FC]; returns g.dtype == y.dtype shaped like y."""
    b, d, h, w, fc = y.shape
    blk = jnp.arange(fc) // n_class
    gmat = (blk[:, None] == blk[None, :]).astype(jnp.float32)
    bd = _pick_bd(d, h, w, fc)
    spec = pl.BlockSpec((1, bd, h, w, fc), lambda bi, i: (bi, i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, bd=bd, h=h, w=w, fc=fc),
        grid=(b, d // bd),
        in_specs=[spec, spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(g, y, gmat)
