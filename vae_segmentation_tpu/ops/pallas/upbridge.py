"""Pallas folded-space stage-boundary bridges: Up (W-packed output) and
Down (W-packed input; second half of this file).

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
    import numpy as np
    sel = np.zeros((4, 8, 2), np.float32)  # [p=(ed,eh), e, ew]
    for ed in range(2):
        for eh in range(2):
            for ew in range(2):
                sel[ed * 2 + eh, (ed * 2 + eh) * 2 + ew, ew] = 1.0
    # one 0/1 contraction instead of 8 dynamic-update-slices per step
    m = jnp.einsum("pew,cd->pecwd", jnp.asarray(sel, k1.dtype), k1,
                   preferred_element_type=jnp.float32).astype(k1.dtype)
    return m.reshape(4, 8 * c, 16 * o)


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


# ---------------------------------------------------------------------------
# The DOWN-direction mirror: W-packed folded fine -> plain folded coarse in
# one kernel (the s2d.expand_down_fold_kernel_w conv). Along W the packed
# fine grid equals the folded coarse grid, so the delta_w taps are LANE
# halves; delta_d selects the input plane of the pair and delta_h the row
# parity (a sublane-pair view + middle-dim index, like the up backward).
# ---------------------------------------------------------------------------


def _down_routing(k: jax.Array) -> jax.Array:
    """TConv-style [2,2,2,C,O] stride-2 conv kernel -> M [8, 8C, 8O]:
    M[(dd,dh,dw)] = block-diag rows, matching ops/s2d.expand_down_kernel's
    eps-major kflat: out block (dd,dh,dw) contracts the full folded lane
    group of the selected input half."""
    from vae_segmentation_tpu.ops import s2d

    c, o = k.shape[3], k.shape[4]
    kflat = s2d.expand_down_kernel(k).reshape(8 * c, o)
    # block-diagonal placement as one 0/1 contraction (was 8 DUS ops/step)
    eye = jnp.asarray(jnp.eye(8), k.dtype)
    m = jnp.einsum("de,ao->daeo", eye, kflat,
                   preferred_element_type=jnp.float32).astype(k.dtype)
    return m.reshape(8, 8 * c, 8 * o)


def _down_fwd_kernel(x_ref, m_ref, b_ref, o_ref, *, hg: int, wg: int,
                     cin2: int, lout: int, stats: bool, st_ref=None):
    # x block [1, 2, Hg, Wg, 2*8C] (fine plane pair); out [1, 1, Hg/2, Wg, 8O]
    c8 = cin2 // 2
    acc = None
    for dd in range(2):
        xr = x_ref[0, dd].reshape(hg // 2, 2, wg, cin2)
        for dh in range(2):
            xp = xr[:, dh].reshape((hg // 2) * wg, cin2)
            for dw in range(2):
                part = jax.lax.dot_general(
                    xp[:, dw * c8:(dw + 1) * c8],
                    m_ref[(dd * 2 + dh) * 2 + dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
    acc = acc + b_ref[0:1, :]
    oc = acc.reshape(hg // 2, wg, lout).astype(o_ref.dtype)
    o_ref[0, 0] = oc
    if stats:
        o32 = oc.reshape((hg // 2) * wg, lout).astype(jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        st_ref[0, 0:1, :] += jnp.sum(o32, axis=0, keepdims=True)
        st_ref[0, 1:2, :] += jnp.sum(o32 * o32, axis=0, keepdims=True)


def _down_bwd_kernel(x_ref, g_ref, m_ref, dx_ref, dk_ref, db_ref, acc_ref,
                     dbacc_ref, *, hg: int, wg: int, cin2: int, lout: int,
                     n: int):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        dbacc_ref[...] = jnp.zeros_like(dbacc_ref)

    c8 = cin2 // 2
    g = g_ref[0, 0].reshape((hg // 2) * wg, lout)
    dbacc_ref[0:1, :] += jnp.sum(g.astype(jnp.float32), axis=0,
                                 keepdims=True)
    for dd in range(2):
        xr = x_ref[0, dd].reshape(hg // 2, 2, wg, cin2)
        parts = []
        for dh in range(2):
            xp = xr[:, dh].reshape((hg // 2) * wg, cin2)
            halves = []
            for dw in range(2):
                dl = (dd * 2 + dh) * 2 + dw
                halves.append(jax.lax.dot_general(
                    g, m_ref[dl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
                acc_ref[dl] += jax.lax.dot_general(
                    xp[:, dw * c8:(dw + 1) * c8], g,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[:, :]
            dxp = jnp.concatenate(halves, axis=1)  # [hw, 2*8C]
            parts.append(dxp.reshape(hg // 2, 1, wg, cin2))
        inter = jnp.concatenate(parts, axis=1).reshape(hg, wg, cin2)
        dx_ref[0, dd] = inter.astype(dx_ref.dtype)

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]
        db_ref[...] = dbacc_ref[...]


def _down_specs(hg, wg, cin2, lout):
    xs = pl.BlockSpec((1, 2, hg, wg, cin2), lambda bi, i: (bi, i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    os = pl.BlockSpec((1, 1, hg // 2, wg, lout),
                      lambda bi, i: (bi, i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    return xs, os


def _run_down_fwd(x, m, bias, stats):
    b, d, hg, wg, cin2 = x.shape
    lout = m.shape[-1]
    xs, os = _down_specs(hg, wg, cin2, lout)
    out_specs, out_shape = os, jax.ShapeDtypeStruct(
        (b, d // 2, hg // 2, wg, lout), x.dtype)
    if stats:
        out_specs = (os, pl.BlockSpec((1, 2, lout),
                                      lambda bi, i: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, 2, lout), jnp.float32))

    def kern(x_ref, m_ref, b_ref, *outs):
        _down_fwd_kernel(x_ref, m_ref, b_ref, outs[0], hg=hg, wg=wg,
                         cin2=cin2, lout=lout, stats=stats,
                         st_ref=outs[1] if stats else None)

    return pl.pallas_call(
        kern,
        grid=(b, d // 2),
        in_specs=[xs, pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, m.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32))


def _run_down_bwd(x, gy, m):
    b, d, hg, wg, cin2 = x.shape
    lout = m.shape[-1]
    xs, os = _down_specs(hg, wg, cin2, lout)
    dx, dk, db = pl.pallas_call(
        functools.partial(_down_bwd_kernel, hg=hg, wg=wg, cin2=cin2,
                          lout=lout, n=b * (d // 2)),
        grid=(b, d // 2),
        in_specs=[xs, os, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 2, hg, wg, cin2),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, cin2 // 2, lout),
                                lambda bi, i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, lout), lambda bi, i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, d, hg, wg, cin2), x.dtype),
                   jax.ShapeDtypeStruct((8, cin2 // 2, lout), jnp.float32),
                   jax.ShapeDtypeStruct((1, lout), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, cin2 // 2, lout), jnp.float32),
                        pltpu.VMEM((1, lout), jnp.float32)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, gy, m.astype(x.dtype))
    return dx, dk, db.reshape(lout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def down_bridge_w(x: jax.Array, k: jax.Array, bias: jax.Array,
                  stats: bool = False):
    """W-PACKED folded fine [B, D, Hg, Wg, 2*8C] -> plain folded coarse
    [B, D/2, Hg/2, Wg, 8O] (== the s2d.expand_down_fold_kernel_w conv).
    k: the raw [2,2,2,C,O] stride-2 kernel; bias: [O] f32 (tiled to 8O).
    stats: also return the output's [B, 2, 8O] f32 (sum, sumsq) so the
    following DoubleConv's first-conv stats need no separate pass."""
    out, _ = _down_fwd_vjp(x, k, bias, stats)
    return out


def _down_fwd_vjp(x, k, bias, stats):
    from vae_segmentation_tpu.ops import s2d

    m = _down_routing(k)
    out = _run_down_fwd(x, m, jnp.tile(bias, s2d.NB), stats)
    y = out[0] if stats else None
    return out, (x, k, y)


def _down_bwd_vjp(stats, res, g):
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.stencil3 import _stats_cotangent

    x, k, y = res
    c, o = k.shape[3], k.shape[4]
    m = _down_routing(k)
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    dx, dkm, db = _run_down_bwd(x, gy, m)
    # adjoint of _down_routing -> kflat -> expand_down_kernel
    kflat_ct = sum(dkm[dl, :, dl * o:(dl + 1) * o] for dl in range(8))
    _, vjp = jax.vjp(lambda kk: s2d.expand_down_kernel(kk).reshape(8 * c, o),
                     k)
    dk, = vjp(kflat_ct.astype(k.dtype))
    # db of the tiled bias: sum the 8 fold copies
    db_orig = db.reshape(s2d.NB, o).sum(0)
    return dx.astype(x.dtype), dk.astype(k.dtype), db_orig.astype(jnp.float32)


down_bridge_w.defvjp(_down_fwd_vjp, _down_bwd_vjp)


# ---------------------------------------------------------------------------
# Down bridge with a fused InstanceNorm+ReLU PROLOGUE: the encoder stage
# boundary in_block -> down1 has no dropout or skip between the stage-final
# norm and the stride-2 bridge conv, so the norm's affine can ride into the
# bridge kernel (relu(x*s + t) applied at plane load) instead of
# materializing the normalized full-res tensor. Backward mirrors
# stencil3's pre machinery: the dx kernel pushes the cotangent through the
# relu mask and accumulates ds/dt in-kernel.
# ---------------------------------------------------------------------------


def _down_fwd_pre_kernel(x_ref, s_ref, t_ref, m_ref, b_ref, o_ref, *,
                         hg: int, wg: int, cin2: int, lout: int,
                         stats: bool, st_ref=None):
    c8 = cin2 // 2
    acc = None
    for dd in range(2):
        xn = jnp.maximum(x_ref[0, dd] * s_ref[0] + t_ref[0], 0.0) \
            .astype(x_ref.dtype)
        xr = xn.reshape(hg // 2, 2, wg, cin2)
        for dh in range(2):
            xp = xr[:, dh].reshape((hg // 2) * wg, cin2)
            for dw in range(2):
                part = jax.lax.dot_general(
                    xp[:, dw * c8:(dw + 1) * c8],
                    m_ref[(dd * 2 + dh) * 2 + dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
    acc = acc + b_ref[0:1, :]
    oc = acc.reshape(hg // 2, wg, lout).astype(o_ref.dtype)
    o_ref[0, 0] = oc
    if stats:
        o32 = oc.reshape((hg // 2) * wg, lout).astype(jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _():
            st_ref[...] = jnp.zeros_like(st_ref)

        st_ref[0, 0:1, :] += jnp.sum(o32, axis=0, keepdims=True)
        st_ref[0, 1:2, :] += jnp.sum(o32 * o32, axis=0, keepdims=True)


def _down_bwd_pre_kernel(x_ref, s_ref, t_ref, g_ref, m_ref, dx_ref, dk_ref,
                         db_ref, dst_ref, acc_ref, dbacc_ref, dstacc_ref, *,
                         hg: int, wg: int, cin2: int, lout: int, n: int):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        dbacc_ref[...] = jnp.zeros_like(dbacc_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dstacc_ref[...] = jnp.zeros_like(dstacc_ref)

    c8 = cin2 // 2
    g = g_ref[0, 0].reshape((hg // 2) * wg, lout)
    dbacc_ref[0:1, :] += jnp.sum(g.astype(jnp.float32), axis=0,
                                 keepdims=True)
    s32 = s_ref[0].astype(jnp.float32)
    t32 = t_ref[0].astype(jnp.float32)
    for dd in range(2):
        x_raw = x_ref[0, dd]                                  # [Hg, Wg, C]
        xn = jnp.maximum(x_raw * s_ref[0] + t_ref[0], 0.0) \
            .astype(x_ref.dtype)
        xr = xn.reshape(hg // 2, 2, wg, cin2)
        parts = []
        for dh in range(2):
            xp = xr[:, dh].reshape((hg // 2) * wg, cin2)
            halves = []
            for dw in range(2):
                dl = (dd * 2 + dh) * 2 + dw
                halves.append(jax.lax.dot_general(
                    g, m_ref[dl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
                acc_ref[dl] += jax.lax.dot_general(
                    xp[:, dw * c8:(dw + 1) * c8], g,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            gxn = jnp.concatenate(halves, axis=1)  # [hw, 2*8C]
            parts.append(gxn.reshape(hg // 2, 1, wg, cin2))
        gxn_plane = jnp.concatenate(parts, axis=1).reshape(hg, wg, cin2)
        # prologue backward: gm = 1[x*s+t > 0] * gxn; dx = gm * s;
        # ds += sum(gm * x); dt += sum(gm)
        x32 = x_raw.astype(jnp.float32)
        gm = jnp.where(x32 * s32 + t32 > 0, gxn_plane, 0.0)
        dx_ref[0, dd] = (gm * s32).astype(dx_ref.dtype)
        gm2 = gm.reshape(hg * wg, cin2)
        dstacc_ref[0, 0:1, :] += jnp.sum(
            gm2 * x32.reshape(hg * wg, cin2), axis=0, keepdims=True)
        dstacc_ref[0, 1:2, :] += jnp.sum(gm2, axis=0, keepdims=True)

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]
        db_ref[...] = dbacc_ref[...]

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        dst_ref[...] = dstacc_ref[...]


def _run_down_fwd_pre(x, s, t, m, bias, stats):
    b, d, hg, wg, cin2 = x.shape
    lout = m.shape[-1]
    xs, os = _down_specs(hg, wg, cin2, lout)
    aff = pl.BlockSpec((1, 1, cin2), lambda bi, i: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    out_specs, out_shape = os, jax.ShapeDtypeStruct(
        (b, d // 2, hg // 2, wg, lout), x.dtype)
    if stats:
        out_specs = (os, pl.BlockSpec((1, 2, lout),
                                      lambda bi, i: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, 2, lout), jnp.float32))

    def kern(x_ref, s_ref, t_ref, m_ref, b_ref, *outs):
        _down_fwd_pre_kernel(x_ref, s_ref, t_ref, m_ref, b_ref, outs[0],
                             hg=hg, wg=wg, cin2=cin2, lout=lout,
                             stats=stats, st_ref=outs[1] if stats else None)

    return pl.pallas_call(
        kern,
        grid=(b, d // 2),
        in_specs=[xs, aff, aff, pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, s.astype(x.dtype)[:, None, :], t.astype(x.dtype)[:, None, :],
      m.astype(x.dtype), bias.reshape(1, -1).astype(jnp.float32))


def _run_down_bwd_pre(x, s, t, gy, m):
    b, d, hg, wg, cin2 = x.shape
    lout = m.shape[-1]
    xs, os = _down_specs(hg, wg, cin2, lout)
    aff = pl.BlockSpec((1, 1, cin2), lambda bi, i: (bi, 0, 0),
                       memory_space=pltpu.VMEM)
    dx, dk, db, dst = pl.pallas_call(
        functools.partial(_down_bwd_pre_kernel, hg=hg, wg=wg, cin2=cin2,
                          lout=lout, n=b * (d // 2)),
        grid=(b, d // 2),
        in_specs=[xs, aff, aff, os, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 2, hg, wg, cin2),
                                lambda bi, i: (bi, i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, cin2 // 2, lout),
                                lambda bi, i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, lout), lambda bi, i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 2, cin2), lambda bi, i: (bi, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, d, hg, wg, cin2), x.dtype),
                   jax.ShapeDtypeStruct((8, cin2 // 2, lout), jnp.float32),
                   jax.ShapeDtypeStruct((1, lout), jnp.float32),
                   jax.ShapeDtypeStruct((b, 2, cin2), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, cin2 // 2, lout), jnp.float32),
                        pltpu.VMEM((1, lout), jnp.float32),
                        pltpu.VMEM((1, 2, cin2), jnp.float32)],
        compiler_params=_params(),
        interpret=_interpret(),
    )(x, s.astype(x.dtype)[:, None, :], t.astype(x.dtype)[:, None, :],
      gy, m.astype(x.dtype))
    return dx, dk, db.reshape(lout), dst


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def down_bridge_w_pre(x: jax.Array, s: jax.Array, t: jax.Array,
                      k: jax.Array, bias: jax.Array, stats: bool = False):
    """down_bridge_w with the fused InstanceNorm+ReLU prologue:
    == down_bridge_w(relu(x * s[:, None..] + t), k, bias). s/t: [B, CL]
    per-(batch, lane) affine of the producing stage's final norm."""
    out, _ = _down_pre_fwd_vjp(x, s, t, k, bias, stats)
    return out


def _down_pre_fwd_vjp(x, s, t, k, bias, stats):
    from vae_segmentation_tpu.ops import s2d

    m = _down_routing(k)
    out = _run_down_fwd_pre(x, s, t, m, jnp.tile(bias, s2d.NB), stats)
    y = out[0] if stats else None
    return out, (x, s, t, k, y)


def _down_pre_bwd_vjp(stats, res, g):
    from vae_segmentation_tpu.ops import s2d
    from vae_segmentation_tpu.ops.pallas.stencil3 import _stats_cotangent

    x, s, t, k, y = res
    c, o = k.shape[3], k.shape[4]
    m = _down_routing(k)
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    dx, dkm, db, dst = _run_down_bwd_pre(x, s, t, gy, m)
    kflat_ct = sum(dkm[dl, :, dl * o:(dl + 1) * o] for dl in range(8))
    _, vjp = jax.vjp(lambda kk: s2d.expand_down_kernel(kk).reshape(8 * c, o),
                     k)
    dk, = vjp(kflat_ct.astype(k.dtype))
    db_orig = db.reshape(s2d.NB, o).sum(0)
    return (dx.astype(x.dtype), dst[:, 0].astype(s.dtype),
            dst[:, 1].astype(t.dtype), dk.astype(k.dtype),
            db_orig.astype(jnp.float32))


down_bridge_w_pre.defvjp(_down_pre_fwd_vjp, _down_pre_bwd_vjp)
