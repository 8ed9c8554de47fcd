"""Pallas folded-space Up bridge (W-packed output).

The Up boundary's folded->folded stride-2 ConvTranspose
(s2d.expand_up_fold_kernel_w via XLA conv_transpose) is mathematically one
conv, but XLA's transpose-conv lowering emits it in a channel-minor
T(4,128) layout and then pays full-volume `copy`/`copy_add` fixups to feed
the standard-layout Pallas stencil consumers (~5 ms/step at b4 128^3,
round-3 trace). This kernel produces the W-packed folded fine rep directly
in the standard layout:

    out[2p+ed][2ph+eh, pw, (ew, delta, o)] =
        sum_c x[p][ph, pw, (ed, eh, ew)-block, c] * k1[c, (delta, o)]

One [Hg*Wg, 8C] @ [8C, 2*8*O] GEMM per (ed, eh) part; the row interleave
(2ph+eh) is a free major-dim reshape; along W the packed fine grid equals
the folded coarse grid (s2d.expand_up_fold_kernel_w note), so ew is pure
lane routing baked into the M matrices. Backward is one kernel computing
dx (GEMMs against M^T) and accumulating dk/db across the sequential grid.

Exactness: tests/test_pallas.py vs the XLA bridge (s2d kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _routing(k1: jax.Array, c: int, o: int) -> jax.Array:
    """k1 [C, 8O] (s2d.expand_up_kernel block layout) -> M [4, 8C, 16O]:
    M[2*ed+eh][(ed',eh',ew')*C + c, ew*8O + (delta,o)] =
    [ed'==ed][eh'==eh][ew'==ew] * k1[c, (delta,o)]."""
    m = jnp.zeros((4, 8 * c, 16 * o), k1.dtype)
    for ed in range(2):
        for eh in range(2):
            for ew in range(2):
                e = (ed * 2 + eh) * 2 + ew
                m = m.at[ed * 2 + eh, e * c:(e + 1) * c,
                         ew * 8 * o:(ew + 1) * 8 * o].set(k1)
    return m


def _fwd_kernel(x_ref, m_ref, b_ref, o_ref, *, hg: int, wg: int,
                cin: int, lout: int):
    x = x_ref[0, 0].reshape(hg * wg, cin)
    for ed in range(2):
        parts = []
        for eh in range(2):
            y = jax.lax.dot_general(
                x, m_ref[ed * 2 + eh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_ref[0:1, :]
            parts.append(y.reshape(hg, 1, wg, lout))
        inter = jnp.concatenate(parts, axis=1).reshape(2 * hg, wg, lout)
        o_ref[0, ed] = inter.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, m_ref, dx_ref, dk_ref, db_ref, acc_ref,
                dbacc_ref, *, hg: int, wg: int, cin: int, lout: int,
                n: int):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        dbacc_ref[...] = jnp.zeros_like(dbacc_ref)

    x = x_ref[0, 0].reshape(hg * wg, cin)
    dx = None
    for ed in range(2):
        g2 = g_ref[0, 0, ed].reshape(hg, 2, wg, lout)
        for eh in range(2):
            gp = g2[:, eh].reshape(hg * wg, lout)
            part = jax.lax.dot_general(
                gp, m_ref[ed * 2 + eh], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx = part if dx is None else dx + part
            acc_ref[ed * 2 + eh] += jax.lax.dot_general(
                x, gp, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbacc_ref[0:1, :] += jnp.sum(gp.astype(jnp.float32), axis=0,
                                         keepdims=True)
    dx_ref[0, 0] = dx.reshape(hg, wg, cin).astype(dx_ref.dtype)

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]
        db_ref[...] = dbacc_ref[...]


def _specs(b, g, hg, wg, cin, lout):
    xs = pl.BlockSpec((1, 1, hg, wg, cin), lambda bi, i: (bi, i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, 2, 2 * hg, wg, lout),
                      lambda bi, i: (bi, i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    return xs, os


def _params():
    return None if _interpret() else pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)


def _run_fwd(x, m, bias):
    b, g, hg, wg, cin = x.shape
    lout = m.shape[-1]
    xs, os = _specs(b, g, hg, wg, cin, lout)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hg=hg, wg=wg, cin=cin, lout=lout),
        grid=(b, g),
        in_specs=[xs, pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, 2 * hg, wg, lout),
                               lambda bi, i: (bi, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * g, 2 * hg, wg, lout),
                                       x.dtype),
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, m.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32))


def _run_bwd(x, gy, m):
    b, g, hg, wg, cin = x.shape
    lout = m.shape[-1]
    xs, _ = _specs(b, g, hg, wg, cin, lout)
    gs = pl.BlockSpec((1, 2, 2 * hg, wg, lout),
                      lambda bi, i: (bi, i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    # gy arrives as [B, 2G, 2Hg, Wg, LOUT]; view the D planes pairwise
    gy = gy.reshape(b, g, 2, 2 * hg, wg, lout)
    dx, dk, db = pl.pallas_call(
        functools.partial(_bwd_kernel, hg=hg, wg=wg, cin=cin, lout=lout,
                          n=b * g),
        grid=(b, g),
        in_specs=[xs,
                  pl.BlockSpec((1, 1, 2, 2 * hg, wg, lout),
                               lambda bi, i: (bi, i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, hg, wg, cin),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((4, cin, lout),
                                lambda bi, i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, lout), lambda bi, i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, g, hg, wg, cin), x.dtype),
                   jax.ShapeDtypeStruct((4, cin, lout), jnp.float32),
                   jax.ShapeDtypeStruct((1, lout), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((4, cin, lout), jnp.float32),
                        pltpu.VMEM((1, lout), jnp.float32)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, gy, m.astype(x.dtype))
    return dx, dk, db.reshape(lout)


@jax.custom_vjp
def up_bridge_w(x: jax.Array, k1: jax.Array, bias: jax.Array) -> jax.Array:
    """Folded coarse [B, G, Hg, Wg, 8C] -> W-PACKED folded fine
    [B, 2G, 2Hg, Wg, 16O]. k1: [C, 8O] (s2d.expand_up_kernel block of the
    TConv2 kernel); bias: [16O] f32 (the tiled TConv2 bias)."""
    c, o8 = k1.shape
    return _run_fwd(x, _routing(k1, c, o8 // 8), bias)


def _fwd(x, k1, bias):
    return up_bridge_w(x, k1, bias), (x, k1)


def _bwd(res, g):
    x, k1 = res
    c, o8 = k1.shape
    o = o8 // 8
    m = _routing(k1, c, o)
    dx, dkm, db = _run_bwd(x, g, m)
    # adjoint of _routing: gather each (ed, eh) part's diagonal blocks
    dk1 = jnp.zeros((c, 8 * o), jnp.float32)
    for ed in range(2):
        for eh in range(2):
            for ew in range(2):
                e = (ed * 2 + eh) * 2 + ew
                dk1 = dk1 + dkm[ed * 2 + eh, e * c:(e + 1) * c,
                                ew * 8 * o:(ew + 1) * 8 * o]
    return dx.astype(x.dtype), dk1.astype(k1.dtype), db.astype(jnp.float32)


up_bridge_w.defvjp(_fwd, _bwd)
