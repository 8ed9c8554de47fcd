"""Pallas space-to-depth fold for full-resolution 1-channel volumes.

The adaptation step folds the raw image and the label volume into the
production s2d rep (ops/s2d.py fold / fold_w) once per step. XLA lowers
that reshape+transpose as generic `copy` ops that run ~50-100x off the
HBM floor on TPU (tools/probes/fold_time.py: 3.6 ms isolated, ~2.7 ms/step
in situ for the two folds at b4 128^3 — vs a ~0.04 ms floor).

This kernel computes the fold as four MXU GEMMs per D-pair plane:

    out[hp, :] += x[2dp+ed][2hp+eh, :] @ P[ed, eh]      (ed, eh in {0,1})

where P[ed, eh] is a 0/1 [W, LOUT] lane-routing matrix placing input lane
w at the folded output lane. The (ed, eh) outputs occupy DISJOINT output
lanes, so the sum is a concatenation in disguise; 0/1 matmuls with f32
accumulation are exact for bf16 inputs. The sublane selection (2hp+eh) is
a free in-kernel sublane reshape — only the LANE routing needs the MXU,
which is what the fold fundamentally is: a lane-dimension restructuring
that Mosaic (correctly) refuses to express as a reshape.

Backward (rarely live — the folded image/label are gradient leaves) is the
XLA unfold of the cotangent.

STATUS — measured and UNWIRED (round 3, tools/probes/fold_time.py on v5e):
isolated, the XLA reorg costs 3.6 ms and this kernel 1.7 ms per fold; but
in situ XLA schedules the step's two folds at ~2.7 ms total, so the kernel
would not beat the XLA path it replaces (the [64, 128] GEMM granularity is
Mosaic-overhead-bound, ~40x off the 0.04 ms HBM floor either way). Kept as
the measured-exclusion record (BENCH.md); the real fix is emitting
pre-folded tensors from the ingest pipeline.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _routing(w: int, wpack: bool):
    """[4, W, LOUT] 0/1 routing matrices, (ed, eh) major."""
    lout = (w // 4) * 16 if wpack else (w // 2) * 8
    p = np.zeros((4, w, lout), np.float32)
    for ed in range(2):
        for eh in range(2):
            for wi in range(w):
                if wpack:
                    lane = ((wi // 4) * 16 + ((wi // 2) % 2) * 8
                            + ed * 4 + eh * 2 + (wi % 2))
                else:
                    lane = (wi // 2) * 8 + ed * 4 + eh * 2 + (wi % 2)
                p[ed * 2 + eh, wi, lane] = 1.0
    return p


def _kernel(x_ref, p_ref, s_ref, o_ref, *, h: int, w: int, bd: int):
    for r in range(bd):
        acc = None
        for ed in range(2):
            xp = x_ref[0, 2 * r + ed]                    # [H, W]
            for eh in range(2):
                # row selection (2hp+eh) via the 0/1 S matrix — a
                # sublane-strided slice lowers poorly in Mosaic, the MXU
                # does strided row gathers for free
                rows = jax.lax.dot_general(
                    s_ref[eh], xp, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [H/2, W]
                part = jax.lax.dot_general(
                    rows.astype(xp.dtype), p_ref[ed * 2 + eh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        o_ref[0, r] = acc.astype(o_ref.dtype)


def _run(x: jax.Array, wpack: bool) -> jax.Array:
    b, d, h, w = x.shape
    lout = (w // 4) * 16 if wpack else (w // 2) * 8
    bd = 4 if (d // 2) % 4 == 0 else 1
    p = jnp.asarray(_routing(w, wpack), jnp.bfloat16)
    s = np.zeros((2, h // 2, h), np.float32)
    for eh in range(2):
        s[eh, np.arange(h // 2), 2 * np.arange(h // 2) + eh] = 1.0
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, bd=bd),
        grid=(b, d // 2 // bd),
        in_specs=[
            pl.BlockSpec((1, 2 * bd, h, w), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bd, h // 2, lout),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d // 2, h // 2, lout),
                                       jnp.bfloat16),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x.astype(jnp.bfloat16), p, jnp.asarray(s, jnp.bfloat16))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fold1(x: jax.Array, wpack: bool = False) -> jax.Array:
    """[B, D, H, W] (any float dtype) -> the bf16 folded rep of the
    1-channel volume: [B, D/2, H/2, W/2, 8] (or the W-PACKED
    [B, D/2, H/2, W/4, 16]), exactly s2d.fold(_w) of x[..., None]."""
    b, d, h, w = x.shape
    flat = _run(x, wpack)
    if wpack:
        return flat.reshape(b, d // 2, h // 2, w // 4, 16)
    return flat.reshape(b, d // 2, h // 2, w // 2, 8)


def _fwd(x, wpack):
    return fold1(x, wpack), x.dtype


def _bwd(wpack, in_dtype, g):
    from vae_segmentation_tpu.ops import s2d

    if wpack:
        g = s2d.unfold_w(g)
    return (s2d.unfold(g)[..., 0].astype(in_dtype),)


fold1.defvjp(_fwd, _bwd)
