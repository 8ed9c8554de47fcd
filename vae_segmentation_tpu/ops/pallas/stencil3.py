"""Production Pallas 3^3 stencil conv for the folded trunk stages.

Why (round-2 trace, BENCH.md): XLA's TPU conv emitter lowers the folded
3^3 convs at the 64^3/32^3 stages (C = 64/128 after space-to-depth) into
tap-expanded fusions ("EmitOutputBatchInSublanes", [.., 9, C] buffers) that
cost 3-9 ms EACH — the dominant share of the adaptation step. This kernel
computes the same conv as 9 tap-batched MXU GEMMs per depth-tap, with no
materialized im2col and each input plane read at most 3x:

    grid (B, D); refs x[d-1], x[d], x[d+1] as [H, W, C] VMEM blocks
    view plane as [H*W, C]      (layout-preserving collapse; W % 8 == 0)
    for dd in (-1, 0, 1):                   # depth taps
      for dh in (-1, 0, 1):                 # row taps
        A3 = concat(shift(x[dd], dh, dw) for dw in -1..1)   # [H*W, 3C]
        acc += A3 @ K[dd, dh]               # [3C, Cout] MXU GEMM, f32 acc

Shifts are sublane rolls with iota edge masks (dh masks whole row blocks,
dw masks the r % W == 0 / W-1 columns' wraparound rows). Weights arrive
EXPANDED ([3,3,3,Cin,Cout] from ops/s2d.py) and in bf16 alongside bf16
activations — the MXU runs at full bf16 rate with f32 accumulation.

Custom VJP (no residual beyond the inputs):
    dx = same kernel, spatially-flipped kernel with I/O channels swapped
    dk = per-plane A3^T @ g tap-GEMMs accumulated across the sequential
         grid into a [3, 3, 3C, Cout] f32 scratch (one kernel)
    db = sum(g) over all but the channel axis (emitted by the dk kernel)

Parity: tests/test_stencil3.py (interpret mode on CPU, plus the s2d
algebraic equivalence). Reference behavior target: the stride-1 SAME conv
of joint_model.py:35-52/101-112 composed with the s2d fold (exact).

Design history: a first kernel (ops/pallas/conv3.py, removed round 3) kept
activations in natural [H, W*C] lane-planes to avoid XLA's channel-lane
padding at C<16; Mosaic rejects its [H, W*C]->[H*W, C] in-kernel view as a
lane-dimension shape cast, which is WHY this kernel keeps channels in
lanes end to end and gets its lane density from the s2d fold instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_params():
    """CompilerParams for the forward conv kernels. The (B, D) grid has no
    cross-step dependencies (pure reads of overlapping plane windows,
    disjoint output blocks), so "parallel" dimension semantics would be
    legal — but measured (round 3): declaring them sends Mosaic's scheduler
    into multi-MINUTE compiles per kernel shape (18 min for the first hot
    shape) with no observed runtime win on the isolated probe, so the
    default stays "arbitrary". VAESEG_STENCIL_DIMSEM=parallel re-enables
    the experiment.

    vmem_limit: 64 MB (v5e has 128 MB VMEM; Mosaic's default scoped cap is
    32 MB). The depth-blocked layouts (bd>1) carry (bd+2)-plane input
    blocks plus kernel temps — the widest stage (64^3 C=256 grouped, bd=4)
    sits at ~33 MB scoped, which the default cap rejects."""
    if _interpret():
        return None
    import os as _os
    sem = _os.environ.get("VAESEG_STENCIL_DIMSEM", "arbitrary")
    dims = ("parallel", "parallel") if sem == "parallel" \
        else ("arbitrary", "arbitrary")
    return pltpu.CompilerParams(dimension_semantics=dims,
                                vmem_limit_bytes=64 * 1024 * 1024)


def _row_iota(r: int, c: int):
    return jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)


def _shifted(plane: jax.Array, dh: int, dw: int, w: int):
    """The (dh, dw) tap view of a [R=H*W, C] plane: sublane roll with
    zero-filled h/w edges."""
    r, c = plane.shape
    rows = _row_iota(r, c)
    off = dh * w + dw
    p = jnp.roll(plane, -off, 0) if off else plane
    # h-edge: output row h reads h+dh -> invalid head/tail row blocks
    if dh > 0:
        p = jnp.where(rows >= r - dh * w, 0.0, p)
    elif dh < 0:
        p = jnp.where(rows < -dh * w, 0.0, p)
    # w-edge: output col w reads w+dw -> invalid where (r % W) wraps
    if dw > 0:
        p = jnp.where(rows % w >= w - dw, 0.0, p)
    elif dw < 0:
        p = jnp.where(rows % w < -dw, 0.0, p)
    return p


def _shifted3(plane: jax.Array, dh: int, w: int):
    """plane [R=H*W, C] -> [R, 3C]: lane-concat of the dw=-1,0,1 shifts of
    the dh-shifted plane, zero-filled at h/w edges. Used when C < 128 to
    fill the MXU's contraction dim; at C >= 128 the per-dw GEMMs are
    already full-rate and skipping the concat saves ~4 MB of VMEM."""
    return jnp.concatenate(
        [_shifted(plane, dh, dw, w) for dw in (-1, 0, 1)], axis=1)


def _load_planes(hp_ref, main_ref, hn_ref, dloc, *, h, w, cin, d, bd,
                 pre, s_ref, t_ref, dlim_ref):
    """Load the bd+2 planes a D-block needs — each exactly ONCE, with the
    optional norm+relu prologue applied once per plane (the bd=1 layout
    re-reads every plane 3x across grid steps AND re-applies the prologue
    each time; blocking cuts both). Returns planes[j] = global plane
    bd*dloc - 1 + j, zero-masked when out of the valid range."""
    def prep(p, gidx, edge):
        p = p.reshape(h * w, cin)
        if pre:
            p = jnp.maximum(p * s_ref[0] + t_ref[0], 0.0).astype(p.dtype)
            # dlim: valid plane range [lo, hi]. Under the spatial halo wrap
            # edge shards carry zero-filled halo planes which the prologue
            # would turn into relu(shift) != 0 — mask EVERY plane against
            # the per-shard range so out-of-volume stays 0.
            valid = jnp.logical_and(gidx >= dlim_ref[0], gidx <= dlim_ref[1])
            p = p * jnp.where(valid, 1.0, 0.0).astype(p.dtype)
        elif edge:
            # zero the out-of-volume halo (index_map clamps the block)
            valid = jnp.logical_and(gidx >= 0, gidx <= d - 1)
            p = p * jnp.where(valid, 1.0, 0.0).astype(p.dtype)
        return p

    base = bd * dloc
    planes = [prep(hp_ref[0, 0], base - 1, True)]
    for j in range(bd):
        # main rows are always in [0, d-1] — no mask unless pre+dlim
        planes.append(prep(main_ref[0, j], base + j, False))
    planes.append(prep(hn_ref[0, 0], base + bd, True))
    return planes


def _accum_stats(st_ref, outs):
    """Stats epilogue: accumulate per-(batch, channel) sum / sum-of-squares
    of the STORED output planes into the [1, 2, Cout] f32 stats block
    (revisited across the D grid; init at the first step). Computed from
    the cast values so downstream instance-norm statistics match the
    unfused convert+reduce bit-for-bit up to summation order — the whole
    point is that the consumer's stats pass no longer re-reads the
    activation from HBM."""
    s = q = None
    for oc in outs:
        o32 = oc.astype(jnp.float32)
        ps = jnp.sum(o32, axis=0, keepdims=True)          # [1, Cout]
        pq = jnp.sum(o32 * o32, axis=0, keepdims=True)
        s = ps if s is None else s + ps
        q = pq if q is None else q + pq

    @pl.when(pl.program_id(1) == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    st_ref[0, 0:1, :] += s
    st_ref[0, 1:2, :] += q


def _apply_post(acc, r, *, xs_ref, ps_ref, pt_ref, pdlim_ref, dst_ref,
                hw: int, cout: int, bd: int):
    """dx-conv EPILOGUE: push the conv's output (the normalized-input
    cotangent gxn) through the fused prologue's relu(x*s + t) backward —
    gm = 1[x*s+t > 0] * gxn, dx = gm * s — and accumulate the affine
    gradients ds = sum(gm * x), dt = sum(gm) into the [1, 2, Cin] block
    (out-of-volume planes masked from the sums — under the spatial halo
    wrap an edge shard's halo plane does not exist globally, and with x=0
    the relu mask is t>0, so dt would pick up a spurious term without it).
    Replaces a full-resolution XLA pass (read x + gxn, write dx, two
    reductions) per fused-prologue conv backward."""
    xp = xs_ref[0, r].reshape(hw, cout).astype(jnp.float32)
    s32 = ps_ref[0].astype(jnp.float32)
    t32 = pt_ref[0].astype(jnp.float32)
    gm = jnp.where(xp * s32 + t32 > 0, acc, 0.0)
    gidx = bd * pl.program_id(1) + r
    valid = jnp.logical_and(gidx >= pdlim_ref[0], gidx <= pdlim_ref[1])
    gmv = gm * jnp.where(valid, 1.0, 0.0)
    dst_ref[0, 0:1, :] += jnp.sum(gmv * xp, axis=0, keepdims=True)
    dst_ref[0, 1:2, :] += jnp.sum(gmv, axis=0, keepdims=True)
    return gm * s32


def _conv_kernel(hp_ref, main_ref, hn_ref, *rest,
                 h: int, w: int, cin: int, cout: int, d: int, relu: bool,
                 bd: int = 1, pre: bool = False, stats: bool = False,
                 post: bool = False):
    """bd output planes [H, W, Cout] per grid step, each the sum of 9
    tap-GEMMs [H*W,3C]@[3C,Cout] over its 3 depth taps. Inputs: a 1-plane
    halo below, the bd-plane main block, a 1-plane halo above — 1 + 2/bd
    plane DMAs per output instead of the 3 of the unblocked layout.

    pre: extra refs (scale, shift — [1, Cin] per-batch blocks; dlim [2]
    SMEM) and each loaded plane becomes relu(plane * scale + shift) BEFORE
    the taps — the fused InstanceNorm+ReLU prologue (conv+norm+act north
    star). Applied before the validity mask and the h/w shifts so SAME
    zero padding pads the NORMALIZED tensor, exactly like the unfused
    norm -> conv chain.

    stats: extra [1, 2, Cout] f32 output accumulating the output's
    per-(batch, channel) sum and sum-of-squares (see _accum_stats)."""
    xs_ref = ps_ref = pt_ref = pdlim_ref = dst_ref = None
    if pre:
        s_ref, t_ref, dlim_ref, k_ref, b_ref, o_ref, *st = rest
    elif post:
        s_ref = t_ref = dlim_ref = None
        xs_ref, ps_ref, pt_ref, pdlim_ref, k_ref, b_ref, o_ref, \
            dst_ref = rest
    else:
        s_ref = t_ref = dlim_ref = None
        k_ref, b_ref, o_ref, *st = rest
    if post:
        @pl.when(pl.program_id(1) == 0)
        def _():
            dst_ref[...] = jnp.zeros_like(dst_ref)
    planes = _load_planes(hp_ref, main_ref, hn_ref, pl.program_id(1),
                          h=h, w=w, cin=cin, d=d, bd=bd, pre=pre,
                          s_ref=s_ref, t_ref=t_ref, dlim_ref=dlim_ref)
    outs = []
    for r in range(bd):
        acc = jnp.zeros((h * w, cout), jnp.float32) + b_ref[0:1, :]
        for dd in (-1, 0, 1):
            plane = planes[r + dd + 1]
            for dh in (-1, 0, 1):
                if cin >= 128:  # full contraction per dw; no concat buffer
                    for dw in (-1, 0, 1):
                        acc += jax.lax.dot_general(
                            _shifted(plane, dh, dw, w),
                            k_ref[dd + 1, dh + 1,
                                  (dw + 1) * cin:(dw + 2) * cin],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                else:
                    acc += jax.lax.dot_general(
                        _shifted3(plane, dh, w), k_ref[dd + 1, dh + 1],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        if post:
            acc = _apply_post(acc, r, xs_ref=xs_ref, ps_ref=ps_ref,
                              pt_ref=pt_ref, pdlim_ref=pdlim_ref,
                              dst_ref=dst_ref, hw=h * w, cout=cout, bd=bd)
        oc = acc.reshape(h, w, cout).astype(o_ref.dtype)
        o_ref[0, r] = oc
        if stats:
            outs.append(oc.reshape(h * w, cout))
    if stats:
        _accum_stats(st[0], outs)


def _pack_kernel(k: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [3(dd), 3(dh), 3*Cin, Cout]: the dw taps stacked
    along the contraction dim to match _shifted3's lane concat."""
    return k.reshape(3, 3, 3 * k.shape[3], k.shape[4])


# ---------------------------------------------------------------------------
# Grouped-tap path for FOLD-STRUCTURED kernels (the production folded convs).
#
# An s2d-expanded kernel has disjoint per-axis support: the +1 tap only reads
# fold-position-bit 0 input lanes (and writes bit-1 outputs), the -1 tap the
# complement (ops/s2d.py tap rule, F=2 per axis). Two consequences, exact:
#   * K(+1) + K(-1) loses no information (disjoint nonzero rows), and
#   * A @ (K(+1)+K(-1)) == shift_{+1}(x) @ K(+1) + shift_{-1}(x) @ K(-1)
#     when A picks the +1-shifted plane on bit-0 lanes and the -1-shifted
#     plane on bit-1 lanes (a single lane-mask select).
# Applying this along all three axes merges the 27 tap-GEMMs into 8 group
# GEMMs (one per sign pattern in {0,+-}^3) — a 3.4x cut of the MXU work
# that the fold inflation costs, with ~19 extra VPU selects per plane.
# ---------------------------------------------------------------------------

# group order: (has_d, has_h, has_w) sign-pattern flags
GROUPS = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
          (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1))


def _group_taps(g):
    """All (td, th, tw) taps belonging to sign-pattern group g."""
    opts = lambda f: ((-1, 1) if f else (0,))  # noqa: E731
    return [(td, th, tw) for td in opts(g[0]) for th in opts(g[1])
            for tw in opts(g[2])]


@functools.lru_cache()
def _group_mat(flip: bool):
    """[8, 27] 0/1: tap-to-group membership in GROUPS order. flip=True
    indexes the spatially-flipped tap (so pack_grouped of
    flip(k, (0,1,2)) is ONE contraction — the backward's k_t prep)."""
    import numpy as np
    m = np.zeros((len(GROUPS), 27), np.float32)
    for i, g in enumerate(GROUPS):
        for td, th, tw in _group_taps(g):
            if flip:
                td, th, tw = -td, -th, -tw
            m[i, ((td + 1) * 3 + (th + 1)) * 3 + (tw + 1)] = 1.0
    return m


def pack_grouped(k: jax.Array) -> jax.Array:
    """Fold-structured [3,3,3,Cin,Cout] -> [8, Cin, Cout]: per-group sums
    (exact for s2d-expanded kernels — disjoint supports). One 0/1-matrix
    contraction: the per-tap slice+add formulation cost dozens of small
    device ops per conv site per step (round-5 trace)."""
    mat = jnp.asarray(_group_mat(False), k.dtype)
    return jnp.einsum("gt,tio->gio", mat, k.reshape(27, *k.shape[3:]),
                      preferred_element_type=jnp.float32).astype(k.dtype)


def pack_grouped_t(k: jax.Array) -> jax.Array:
    """pack_grouped(flip(k, (0,1,2)).transpose(0,1,2,4,3)) in one
    contraction — the dx kernels' transposed-kernel prep."""
    mat = jnp.asarray(_group_mat(True), k.dtype)
    return jnp.einsum("gt,tio->goi", mat, k.reshape(27, *k.shape[3:]),
                      preferred_element_type=jnp.float32).astype(k.dtype)


def _fold_bits(cin: int, c: int, wpack: bool):
    """Lane-pattern predicates (ed==0, eh==0, w-bit==0) for a folded tensor
    with original channels c. Lane layout (ops/s2d.py): wpack
    [eps_w2][ed][eh][ew][c], else [ed][eh][ew][c]; the paired W axis is
    eps_w2 under wpack (the conv's W axis is W2) and ew otherwise."""
    nbc = 8 * c
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cin), 1)
    pos = (lane % nbc) // c
    ed0 = (pos // 4) == 0
    eh0 = ((pos // 2) % 2) == 0
    w0 = (lane // nbc) == 0 if wpack else (pos % 2) == 0
    return ed0, eh0, w0


def _grouped_conv_body(planes, w: int, cin: int, c: int, wpack: bool,
                       contract):
    """Shared fwd/dk loop: for each tap group, build the lane-selected A and
    apply `contract(group_index, A)`. planes = (xm, x0, xp) [R, Cin],
    already D-validity-masked."""
    ed0, eh0, w0 = _fold_bits(cin, c, wpack)
    xm, x0, xp = planes

    def sel(mask, a, b):
        return jnp.where(mask, a, b)

    for gi, (gd, gh, gw) in enumerate(GROUPS):
        def pick_h(src):
            # the (th, tw) shifted views of one depth plane, h/w paired
            if gh and gw:
                return sel(eh0,
                           sel(w0, _shifted(src, 1, 1, w),
                               _shifted(src, 1, -1, w)),
                           sel(w0, _shifted(src, -1, 1, w),
                               _shifted(src, -1, -1, w)))
            if gh:
                return sel(eh0, _shifted(src, 1, 0, w),
                           _shifted(src, -1, 0, w))
            if gw:
                return sel(w0, _shifted(src, 0, 1, w),
                           _shifted(src, 0, -1, w))
            return src

        if gd:
            a = sel(ed0, pick_h(xp), pick_h(xm))
        else:
            a = pick_h(x0)
        contract(gi, a)


def _conv_kernel_grouped(hp_ref, main_ref, hn_ref, *rest,
                         h: int, w: int, cin: int, cout: int, d: int,
                         c: int, wpack: bool, relu: bool,
                         bd: int = 1, pre: bool = False,
                         stats: bool = False, post: bool = False,
                         soft: bool = False):
    xs_ref = ps_ref = pt_ref = pdlim_ref = dst_ref = gmat_ref = None
    s_ref = t_ref = dlim_ref = None
    rest = list(rest)
    if pre:
        s_ref, t_ref, dlim_ref = rest[:3]
        rest = rest[3:]
    elif post:
        xs_ref, ps_ref, pt_ref, pdlim_ref = rest[:4]
        rest = rest[4:]
    if soft:
        gmat_ref = rest[0]
        rest = rest[1:]
    kg_ref, b_ref, o_ref, *st = rest
    if post:
        dst_ref, = st
        st = []
    if post:
        @pl.when(pl.program_id(1) == 0)
        def _():
            dst_ref[...] = jnp.zeros_like(dst_ref)
    planes = _load_planes(hp_ref, main_ref, hn_ref, pl.program_id(1),
                          h=h, w=w, cin=cin, d=d, bd=bd, pre=pre,
                          s_ref=s_ref, t_ref=t_ref, dlim_ref=dlim_ref)
    outs = []
    for r in range(bd):
        accs = [jnp.zeros((h * w, cout), jnp.float32) + b_ref[0:1, :]]

        def contract(gi, a, accs=accs):
            accs[0] = accs[0] + jax.lax.dot_general(
                a, kg_ref[gi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        _grouped_conv_body((planes[r], planes[r + 1], planes[r + 2]),
                           w, cin, c, wpack, contract)
        out = accs[0]
        if relu:
            out = jnp.maximum(out, 0.0)
        if soft:
            # fused class-group softmax (s2d.softmax_folded math: one
            # stability max over the whole folded lane dim, group exp-sums
            # via the 0/1 lane matmul — here an in-VMEM MXU op, no f32
            # exp tensor ever touches HBM)
            m = jnp.max(out, axis=1, keepdims=True)
            e = jnp.exp(out - m)
            denom = jax.lax.dot_general(
                e, gmat_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = e / denom
        if post:
            out = _apply_post(out, r, xs_ref=xs_ref, ps_ref=ps_ref,
                              pt_ref=pt_ref, pdlim_ref=pdlim_ref,
                              dst_ref=dst_ref, hw=h * w, cout=cout, bd=bd)
        oc = out.reshape(h, w, cout).astype(o_ref.dtype)
        o_ref[0, r] = oc
        if stats:
            outs.append(oc.reshape(h * w, cout))
    if stats:
        _accum_stats(st[0], outs)


def _halo_spec(off: int, d: int, h: int, w: int, c: int, bd: int):
    """Single-plane halo block: global plane bd*i - 1 (off<0) or bd*i + bd
    (off>0), clamped into the volume (the kernel masks the clamp)."""
    delta = bd if off > 0 else -1

    def idx(b, i):
        return (b, jnp.clip(bd * i + delta, 0, d - 1), 0, 0, 0)

    return pl.BlockSpec((1, 1, h, w, c), idx, memory_space=pltpu.VMEM)


def _main_spec(h: int, w: int, c: int, bd: int):
    return pl.BlockSpec((1, bd, h, w, c), lambda b, i: (b, i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _pick_bd(d: int, h: int, w: int, cin: int, cout: int, dlim) -> int:
    """D-block size for the fwd conv kernels: the largest divisor of D
    whose working set ((bd+2) input + bd output planes, double-buffered)
    fits comfortably in VMEM. Round-4 negative result (BENCH.md): raising
    the budget to 44 MB (hot 64^3 C=128/256 stages bd 4->8 / 2->4) MEASURED
    13.59 -> 13.36 steps/s — the bigger blocks starve Mosaic's DMA
    double-buffering more than the saved halo re-reads pay; 24 MB stays.
    Under a nontrivial dlim (the spatial halo wrap's D+2 slab) blocking
    stays available when the slab length divides — the per-plane dlim
    masks are bd-generic (round-4 SP-mesh change)."""
    budget = 24 * 1024 * 1024
    for bd in (8, 4, 2):
        if d % bd:
            continue
        if 2 * 2 * h * w * ((bd + 2) * cin + bd * cout) <= budget:
            return bd
    return 1


def _affine_spec(cin: int):
    """Per-batch scale/shift block for the fused prologue. The arrays are
    passed as [B, 1, Cin] so the block's last two dims (1, Cin) equal the
    array's — Mosaic rejects sub-8 sublane blocks otherwise."""
    return pl.BlockSpec((1, 1, cin), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_spec(cout: int):
    """[B, 2, Cout] f32 stats output: one (sum, sumsq) block per batch,
    revisited (accumulated) across the D grid axis."""
    return pl.BlockSpec((1, 2, cout), lambda bi, i: (bi, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_conv_grouped(x, kg, b, relu, c: int, wpack: bool, pre=None,
                      dlim=None, stats=False, post=None, soft_gmat=None):
    """x [B, D, H, W, Cin]; kg [8, Cin, Cout] grouped; b [Cout] f32;
    pre: optional (scale, shift) [B, Cin] prologue arrays;
    dlim: [2] int32 valid-plane range for pre/post (defaults to whole D);
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq);
    post: optional (x_fwd, scale, shift) — the dx epilogue (_apply_post);
    returns (dx, [B, 2, Cout] f32 (ds, dt)). Mutually exclusive with
    pre/stats/relu."""
    bsz, d, h, w, cin = x.shape
    cout = kg.shape[-1]
    assert w % 8 == 0, w
    assert post is None or (pre is None and not stats and not relu)
    assert soft_gmat is None or (post is None and not stats and not relu)
    bd = _pick_bd(d, h, w, cin, cout * (2 if post is not None else 1),
                  dlim)
    pre_specs = [] if pre is None else [
        _affine_spec(cin), _affine_spec(cin),
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    if (pre is not None or post is not None) and dlim is None:
        dlim = jnp.array([0, d - 1], jnp.int32)
    pre_args = () if pre is None else (
        pre[0].astype(x.dtype)[:, None, :],
        pre[1].astype(x.dtype)[:, None, :], dlim)
    post_specs = [] if post is None else [
        _main_spec(h, w, cout, bd), _affine_spec(cout),
        _affine_spec(cout), pl.BlockSpec(memory_space=pltpu.SMEM)]
    post_args = () if post is None else (
        post[0], post[1].astype(x.dtype)[:, None, :],
        post[2].astype(x.dtype)[:, None, :], dlim)
    soft_specs = [] if soft_gmat is None else [
        pl.BlockSpec(memory_space=pltpu.VMEM)]
    soft_args = () if soft_gmat is None else (
        soft_gmat.astype(jnp.float32),)
    out_specs = _main_spec(h, w, cout, bd)
    out_shape = jax.ShapeDtypeStruct((bsz, d, h, w, cout), x.dtype)
    if stats or post is not None:
        out_specs = (out_specs, _stats_spec(cout))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, 2, cout), jnp.float32))
    return pl.pallas_call(
        functools.partial(_conv_kernel_grouped, h=h, w=w, cin=cin,
                          cout=cout, d=d, c=c, wpack=wpack, relu=relu,
                          bd=bd, pre=pre is not None, stats=stats,
                          post=post is not None,
                          soft=soft_gmat is not None),
        grid=(bsz, d // bd),
        in_specs=[
            _halo_spec(-1, d, h, w, cin, bd),
            _main_spec(h, w, cin, bd),
            _halo_spec(1, d, h, w, cin, bd),
            *pre_specs,
            *post_specs,
            *soft_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_fwd_params(),
        interpret=_interpret(),
    )(x, x, x, *pre_args, *post_args, *soft_args, kg.astype(x.dtype),
      b.reshape(1, -1).astype(jnp.float32))


def _db_spec(cout: int):
    return pl.BlockSpec((1, cout), lambda bi, i: (0, 0),
                        memory_space=pltpu.VMEM)


def _pick_bd_dk(d: int, h: int, w: int, cin: int, cout: int, dlim) -> int:
    """D-block size for the dk kernels: (bd+2) input + bd cotangent planes
    double-buffered, plus the dk accumulator — each input plane then DMAs
    1 + 2/bd times instead of the 3 of the unblocked layout. Blocking stays
    available under a nontrivial dlim when the slab length divides (the
    per-plane masks are bd-generic; round-4 SP-mesh change). Budget kept at
    round 3's 20 MB — see _pick_bd's recorded negative result on raising."""
    budget = 20 * 1024 * 1024
    for bd in (8, 4, 2):
        if d % bd:
            continue
        if 2 * 2 * h * w * ((bd + 2) * cin + bd * cout) <= budget:
            return bd
    return 1


def _dk_kernel_grouped(hp_ref, main_ref, hn_ref, *rest,
                       h: int, w: int, cin: int, cout: int, d: int,
                       c: int, wpack: bool, n: int, bd: int = 1,
                       pre: bool = False):
    """dk[group, Cin, Cout] (+ db[Cout]) accumulated across the sequential
    (B, D/bd) grid. Inputs like the fwd kernels: 1-plane halos + bd-plane
    main x block, bd-plane cotangent block. db = sum of the cotangent over
    all but the channel axis — emitted here so the backward needs no
    separate full read of gy."""
    if pre:
        s_ref, t_ref, dlim_ref, g_ref, dk_ref, db_ref, acc_ref = rest
    else:
        s_ref = t_ref = dlim_ref = None
        g_ref, dk_ref, db_ref, acc_ref = rest
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    planes = _load_planes(hp_ref, main_ref, hn_ref, pl.program_id(1),
                          h=h, w=w, cin=cin, d=d, bd=bd, pre=pre,
                          s_ref=s_ref, t_ref=t_ref, dlim_ref=dlim_ref)
    dbacc = None
    for r in range(bd):
        g = g_ref[0, r].reshape(h * w, cout)

        def contract(gi, a, g=g):
            acc_ref[gi] += jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        _grouped_conv_body((planes[r], planes[r + 1], planes[r + 2]),
                           w, cin, c, wpack, contract)
        gs = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        dbacc = gs if dbacc is None else dbacc + gs
    db_ref[0:1, :] += dbacc

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]


def _run_dk_grouped(x, g, c: int, wpack: bool, pre=None, dlim=None):
    """Returns (dk_grouped [8, Cin, Cout] f32, db [Cout] f32)."""
    bsz, d, h, w, cin = x.shape
    cout = g.shape[-1]
    bd = _pick_bd_dk(d, h, w, cin, cout, dlim)
    pre_specs = [] if pre is None else [
        _affine_spec(cin), _affine_spec(cin),
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    if pre is not None and dlim is None:
        dlim = jnp.array([0, d - 1], jnp.int32)
    pre_args = () if pre is None else (
        pre[0].astype(x.dtype)[:, None, :],
        pre[1].astype(x.dtype)[:, None, :], dlim)
    dk, db = pl.pallas_call(
        functools.partial(_dk_kernel_grouped, h=h, w=w, cin=cin, cout=cout,
                          d=d, c=c, wpack=wpack, n=bsz * (d // bd), bd=bd,
                          pre=pre is not None),
        grid=(bsz, d // bd),
        in_specs=[
            _halo_spec(-1, d, h, w, cin, bd),
            _main_spec(h, w, cin, bd),
            _halo_spec(1, d, h, w, cin, bd),
            *pre_specs,
            _main_spec(h, w, cout, bd),
        ],
        out_specs=(pl.BlockSpec((8, cin, cout), lambda bi, i: (0, 0, 0),
                                memory_space=pltpu.VMEM), _db_spec(cout)),
        out_shape=(jax.ShapeDtypeStruct((8, cin, cout), jnp.float32),
                   jax.ShapeDtypeStruct((1, cout), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((8, cin, cout), jnp.float32)],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(x, x, x, *pre_args, g)
    return dk, db.reshape(cout)


def _run_conv(x: jax.Array, k: jax.Array, b: jax.Array, relu: bool,
              pre=None, dlim=None, stats=False, post=None):
    """x [B, D, H, W, Cin]; k [3,3,3,Cin,Cout]; b [Cout] f32;
    pre: optional (scale, shift) [B, Cin] prologue arrays;
    dlim: [2] int32 valid-plane range for pre/post (defaults to whole D);
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq);
    post: optional (x_fwd, scale, shift) dx epilogue — see
    _run_conv_grouped."""
    bsz, d, h, w, cin = x.shape
    cout = k.shape[-1]
    assert w % 8 == 0, w  # [H, W, C] -> [H*W, C] collapse must be layout-free
    assert post is None or (pre is None and not stats and not relu)
    kp = _pack_kernel(k).astype(x.dtype)
    # the dense kernel's _shifted3 concat buffers (cin < 128) triple the
    # plane working set; halve the block budget accordingly
    bd = _pick_bd(d, h, w, cin * (3 if cin < 128 else 1),
                  cout * (2 if post is not None else 1), dlim)
    pre_specs = [] if pre is None else [
        _affine_spec(cin), _affine_spec(cin),
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    if (pre is not None or post is not None) and dlim is None:
        dlim = jnp.array([0, d - 1], jnp.int32)
    pre_args = () if pre is None else (
        pre[0].astype(x.dtype)[:, None, :],
        pre[1].astype(x.dtype)[:, None, :], dlim)
    post_specs = [] if post is None else [
        _main_spec(h, w, cout, bd), _affine_spec(cout),
        _affine_spec(cout), pl.BlockSpec(memory_space=pltpu.SMEM)]
    post_args = () if post is None else (
        post[0], post[1].astype(x.dtype)[:, None, :],
        post[2].astype(x.dtype)[:, None, :], dlim)
    out_specs = _main_spec(h, w, cout, bd)
    out_shape = jax.ShapeDtypeStruct((bsz, d, h, w, cout), x.dtype)
    if stats or post is not None:
        out_specs = (out_specs, _stats_spec(cout))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bsz, 2, cout), jnp.float32))
    return pl.pallas_call(
        functools.partial(_conv_kernel, h=h, w=w, cin=cin, cout=cout, d=d,
                          relu=relu, bd=bd, pre=pre is not None,
                          stats=stats, post=post is not None),
        grid=(bsz, d // bd),
        in_specs=[
            _halo_spec(-1, d, h, w, cin, bd),
            _main_spec(h, w, cin, bd),
            _halo_spec(1, d, h, w, cin, bd),
            *pre_specs,
            *post_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [1, Cout] f32
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_fwd_params(),
        interpret=_interpret(),
    )(x, x, x, *pre_args, *post_args, kp,
      b.reshape(1, -1).astype(jnp.float32))


def _dk_kernel(hp_ref, main_ref, hn_ref, *rest,
               h: int, w: int, cin: int, cout: int, d: int, n: int,
               bd: int = 1, pre: bool = False):
    """dk[dd, dh, 3Cin, Cout] += A3(x, dd, dh)^T @ g, accumulated across the
    sequential (B, D/bd) grid in f32 scratch (+ db, see
    _dk_kernel_grouped)."""
    if pre:
        s_ref, t_ref, dlim_ref, g_ref, dk_ref, db_ref, acc_ref = rest
    else:
        s_ref = t_ref = dlim_ref = None
        g_ref, dk_ref, db_ref, acc_ref = rest
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    planes = _load_planes(hp_ref, main_ref, hn_ref, pl.program_id(1),
                          h=h, w=w, cin=cin, d=d, bd=bd, pre=pre,
                          s_ref=s_ref, t_ref=t_ref, dlim_ref=dlim_ref)
    dbacc = None
    for r in range(bd):
        g = g_ref[0, r].reshape(h * w, cout)
        for dd in (-1, 0, 1):
            plane = planes[r + dd + 1]
            for dh in (-1, 0, 1):
                if cin >= 128:
                    for dw in (-1, 0, 1):
                        acc_ref[dd + 1, dh + 1,
                                (dw + 1) * cin:(dw + 2) * cin] += \
                            jax.lax.dot_general(
                                _shifted(plane, dh, dw, w), g,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                else:
                    acc_ref[dd + 1, dh + 1] += jax.lax.dot_general(
                        _shifted3(plane, dh, w), g,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        gs = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
        dbacc = gs if dbacc is None else dbacc + gs
    db_ref[0:1, :] += dbacc

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]


def _run_dk(x: jax.Array, g: jax.Array, pre=None, dlim=None):
    """Returns (dk [3,3,3,Cin,Cout] f32, db [Cout] f32)."""
    bsz, d, h, w, cin = x.shape
    cout = g.shape[-1]
    # _shifted3's concat buffers (cin < 128) triple the plane working set
    bd = _pick_bd_dk(d, h, w, cin * (3 if cin < 128 else 1), cout, dlim)
    pre_specs = [] if pre is None else [
        _affine_spec(cin), _affine_spec(cin),
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    if pre is not None and dlim is None:
        dlim = jnp.array([0, d - 1], jnp.int32)
    pre_args = () if pre is None else (
        pre[0].astype(x.dtype)[:, None, :],
        pre[1].astype(x.dtype)[:, None, :], dlim)
    dk, db = pl.pallas_call(
        functools.partial(_dk_kernel, h=h, w=w, cin=cin, cout=cout, d=d,
                          n=bsz * (d // bd), bd=bd, pre=pre is not None),
        grid=(bsz, d // bd),
        in_specs=[
            _halo_spec(-1, d, h, w, cin, bd),
            _main_spec(h, w, cin, bd),
            _halo_spec(1, d, h, w, cin, bd),
            *pre_specs,
            _main_spec(h, w, cout, bd),
        ],
        out_specs=(pl.BlockSpec((3, 3, 3 * cin, cout),
                                lambda bi, i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM), _db_spec(cout)),
        out_shape=(jax.ShapeDtypeStruct((3, 3, 3 * cin, cout), jnp.float32),
                   jax.ShapeDtypeStruct((1, cout), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3, 3, 3 * cin, cout), jnp.float32)],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(x, x, x, *pre_args, g)
    # [3, 3, 3Cin, Cout] -> [3,3,3,Cin,Cout] (undo the dw lane-stack)
    return dk.reshape(3, 3, 3, cin, cout), db.reshape(cout)


def _pick_bd_bwd(d: int, h: int, w: int, cin: int, cout: int, dlim) -> int:
    """D-block size for the MERGED backward kernel (x and gy blocks both
    resident): (bd+2) x-planes + (bd+2) gy-planes + bd dx-planes,
    double-buffered. Same divisibility rules as _pick_bd (incl. bd>1 under
    a dividing dlim slab)."""
    budget = 30 * 1024 * 1024
    for bd in (8, 4, 2):
        if d % bd:
            continue
        if 2 * 2 * h * w * ((bd + 2) * (cin + cout) + bd * cin) <= budget:
            return bd
    return 1


def _bwd_kernel_grouped(xhp_ref, xm_ref, xhn_ref, ghp_ref, gm_ref, ghn_ref,
                        *rest, h: int, w: int, cing: int, coutg: int,
                        d: int, c_x: int, c_g: int, wpack: bool, n: int,
                        bd: int, pre: bool):
    """MERGED backward: dx (grouped conv of gy against the transposed
    kernel), dk (grouped A(x)^T @ gy accumulation), and db — one kernel,
    one pass over gy and x instead of the dx-kernel + dk-kernel pair
    (which each re-read one of them in full; round-4 trace: the pair's
    extra HBM passes + ~2x launches were the largest residual above the
    conv-pool compute floor).

    pre: the fused-prologue backward — x planes get relu(x*s+t) applied
    for dk's A (dlim-masked), and dx gets the _apply_post epilogue (relu
    mask, scale, in-kernel ds/dt accumulation) exactly like the separate
    post-path dx kernel."""
    if pre:
        s_ref, t_ref, dlim_ref, kgt_ref, dx_ref, dk_ref, db_ref, dst_ref, \
            acc_ref = rest
    else:
        s_ref = t_ref = dlim_ref = dst_ref = None
        kgt_ref, dx_ref, dk_ref, db_ref, acc_ref = rest
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    if pre:
        @pl.when(pl.program_id(1) == 0)
        def _():
            dst_ref[...] = jnp.zeros_like(dst_ref)

    planes_x = _load_planes(xhp_ref, xm_ref, xhn_ref, pl.program_id(1),
                            h=h, w=w, cin=cing, d=d, bd=bd, pre=pre,
                            s_ref=s_ref, t_ref=t_ref, dlim_ref=dlim_ref)
    planes_g = _load_planes(ghp_ref, gm_ref, ghn_ref, pl.program_id(1),
                            h=h, w=w, cin=coutg, d=d, bd=bd, pre=False,
                            s_ref=None, t_ref=None, dlim_ref=None)
    dbacc = None
    for r in range(bd):
        # dx plane: grouped conv of the gy planes against kg_t
        accs = [jnp.zeros((h * w, cing), jnp.float32)]

        def contract_dx(gi, a, accs=accs):
            accs[0] = accs[0] + jax.lax.dot_general(
                a, kgt_ref[gi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        _grouped_conv_body((planes_g[r], planes_g[r + 1], planes_g[r + 2]),
                           w, coutg, c_g, wpack, contract_dx)
        out = accs[0]
        if pre:
            out = _apply_post(out, r, xs_ref=xm_ref, ps_ref=s_ref,
                              pt_ref=t_ref, pdlim_ref=dlim_ref,
                              dst_ref=dst_ref, hw=h * w, cout=cing, bd=bd)
        dx_ref[0, r] = out.reshape(h, w, cing).astype(dx_ref.dtype)

        # dk accumulation against the RAW gy main plane
        g_r = planes_g[r + 1]

        def contract_dk(gi, a, g_r=g_r):
            acc_ref[gi] += jax.lax.dot_general(
                a, g_r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        _grouped_conv_body((planes_x[r], planes_x[r + 1], planes_x[r + 2]),
                           w, cing, c_x, wpack, contract_dk)
        gs = jnp.sum(g_r.astype(jnp.float32), axis=0, keepdims=True)
        dbacc = gs if dbacc is None else dbacc + gs
    db_ref[0:1, :] += dbacc

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]


def _run_bwd_grouped(x, gy, k_t_grouped, c_x: int, c_g: int, wpack: bool,
                     pre=None, dlim=None):
    """Merged grouped backward. x [B,D,H,W,Cin]; gy [B,D,H,W,Cout];
    k_t_grouped [8, Cout, Cin] (pack_grouped of the flipped/transposed
    kernel). Returns (dx [B,D,H,W,Cin], dk_grouped [8,Cin,Cout] f32,
    db [Cout] f32) plus dst [B,2,Cin] f32 when pre=(scale, shift)."""
    bsz, d, h, w, cing = x.shape
    coutg = gy.shape[-1]
    bd = _pick_bd_bwd(d, h, w, cing, coutg, dlim)
    pre_specs = [] if pre is None else [
        _affine_spec(cing), _affine_spec(cing),
        pl.BlockSpec(memory_space=pltpu.SMEM)]
    if pre is not None and dlim is None:
        dlim = jnp.array([0, d - 1], jnp.int32)
    pre_args = () if pre is None else (
        pre[0].astype(x.dtype)[:, None, :],
        pre[1].astype(x.dtype)[:, None, :], dlim)
    out_specs = [_main_spec(h, w, cing, bd),
                 pl.BlockSpec((8, cing, coutg), lambda bi, i: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 _db_spec(coutg)]
    out_shape = [jax.ShapeDtypeStruct((bsz, d, h, w, cing), x.dtype),
                 jax.ShapeDtypeStruct((8, cing, coutg), jnp.float32),
                 jax.ShapeDtypeStruct((1, coutg), jnp.float32)]
    if pre is not None:
        out_specs.append(_stats_spec(cing))
        out_shape.append(jax.ShapeDtypeStruct((bsz, 2, cing), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_bwd_kernel_grouped, h=h, w=w, cing=cing,
                          coutg=coutg, d=d, c_x=c_x, c_g=c_g, wpack=wpack,
                          n=bsz * (d // bd), bd=bd, pre=pre is not None),
        grid=(bsz, d // bd),
        in_specs=[
            _halo_spec(-1, d, h, w, cing, bd),
            _main_spec(h, w, cing, bd),
            _halo_spec(1, d, h, w, cing, bd),
            _halo_spec(-1, d, h, w, coutg, bd),
            _main_spec(h, w, coutg, bd),
            _halo_spec(1, d, h, w, coutg, bd),
            *pre_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kg_t
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((8, cing, coutg), jnp.float32)],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x, x, x, gy, gy, gy, *pre_args, k_t_grouped.astype(x.dtype))
    if pre is not None:
        dx, dk, db, dst = res
        return dx, dk, db.reshape(coutg), dst
    dx, dk, db = res
    return dx, dk, db.reshape(coutg)


def use_merged_bwd() -> bool:
    """The merged dx+dk backward kernel (one pass over x and gy instead of
    the dx-kernel + dk-kernel pair). OFF by default: despite halving the
    backward's input HBM traffic it measured 11.8 vs the pair's 13.6
    steps/s/chip on the full step (BENCH.md round-4 A/B) — the doubled
    per-grid-step DMA working set (x AND gy halo streams resident)
    breaks double-buffering at the hot shapes. VAESEG_MERGED_BWD=1
    opts in for A/B."""
    import os as _os
    return _os.environ.get("VAESEG_MERGED_BWD", "0") == "1"


def _grouped_backward(x, gy, k, wpack, pre=None, dlim=None):
    """Shared backward for every grouped folded op: returns
    (dx, dk_logical, db[, dst]) via the merged kernel (or the legacy
    dx+dk kernel pair under VAESEG_MERGED_BWD=0)."""
    kg_t = pack_grouped_t(k)  # flip+transpose+pack in one contraction
    c_x = x.shape[-1] // (16 if wpack else 8)
    c_g = gy.shape[-1] // (16 if wpack else 8)
    if use_merged_bwd():
        res = _run_bwd_grouped(x, gy, kg_t, c_x, c_g, wpack,
                               pre=pre, dlim=dlim)
        if pre is not None:
            dx, dkg, db, dst = res
            return dx, _unpack_grouped_grad(dkg), db, dst
        dx, dkg, db = res
        return dx, _unpack_grouped_grad(dkg), db
    if pre is not None:
        dx, dst = _run_conv_grouped(gy, kg_t,
                                    jnp.zeros((k.shape[3],), jnp.float32),
                                    False, c_g, wpack, post=(x, pre[0],
                                                             pre[1]),
                                    dlim=dlim)
        dkg, db = _run_dk_grouped(x, gy, c_x, wpack, pre=pre, dlim=dlim)
        return dx, _unpack_grouped_grad(dkg), db, dst
    dx = _run_conv_grouped(gy, kg_t,
                           jnp.zeros((k.shape[3],), jnp.float32), False,
                           c_g, wpack)
    dkg, db = _run_dk_grouped(x, gy, c_x, wpack)
    return dx, _unpack_grouped_grad(dkg), db


def _stats_cotangent(y, gy, gst):
    """Fold the stats-output cotangents into gy: the stats are
    sum(y) / sum(y^2), so d(sum)/dy = 1 and d(sumsq)/dy = 2y. One fused
    XLA elementwise pass over tensors the backward touches anyway."""
    y32 = y.astype(jnp.float32)
    gs = gst[:, 0][:, None, None, None, :]
    gq = gst[:, 1][:, None, None, None, :]
    return (gy.astype(jnp.float32) + gs + 2.0 * y32 * gq).astype(gy.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3_stencil(x: jax.Array, k: jax.Array, b: jax.Array,
                  relu: bool = False, stats: bool = False):
    """3^3 stride-1 SAME conv + bias (optional fused ReLU) on
    [B, D, H, W, C], lane-native (W % 8 == 0; C should be a multiple of
    the lane tile for full efficiency). k may be bf16 or f32.
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq) —
    accumulated in-kernel so a following instance norm needs no reduce
    pass over the activation."""
    out, _ = _fwd(x, k, b, relu, stats)
    return out


def _fwd(x, k, b, relu, stats):
    out = _run_conv(x, k, b, relu, stats=stats)
    y = out[0] if stats else out
    return out, (x, k, b, y if (relu or stats) else None)


def _bwd(relu, stats, res, g):
    x, k, b, y = res
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    if relu:
        gy = jnp.where(y > 0, gy, jnp.zeros((), gy.dtype))
    k_t = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _run_conv(gy, k_t, jnp.zeros((k.shape[3],), jnp.float32), False)
    dk, db = _run_dk(x, gy)
    return (dx.astype(x.dtype), dk.astype(k.dtype), db.astype(b.dtype))


conv3_stencil.defvjp(_fwd, _bwd)


def _unpack_grouped_grad(dkg: jax.Array) -> jax.Array:
    """Adjoint of pack_grouped: each tap receives its group's gradient
    (the projection onto the tap's support happens downstream through the
    s2d kernel-expansion VJP). One contraction with pack_grouped's
    transposed 0/1 matrix."""
    mat = jnp.asarray(_group_mat(False), dkg.dtype)
    out = jnp.einsum("gt,gio->tio", mat, dkg,
                     preferred_element_type=jnp.float32).astype(dkg.dtype)
    return out.reshape(3, 3, 3, *dkg.shape[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3_stencil_folded(x: jax.Array, k: jax.Array, b: jax.Array,
                         wpack: bool = False, relu: bool = False,
                         stats: bool = False):
    """Grouped-tap stencil conv for FOLD-STRUCTURED kernels only: k must be
    an s2d-expanded kernel ([3,3,3,Cin,Cout] with the per-axis disjoint tap
    supports of ops/s2d.py), x the matching folded tensor. Exactly equal to
    conv3_stencil on such kernels, at ~1/3 of the MXU passes. NOT correct
    for dense kernels (the group sums would alias taps).
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq)."""
    out, _ = _fwd_folded(x, k, b, wpack, relu, stats)
    return out


def _fwd_folded(x, k, b, wpack, relu, stats):
    kg = pack_grouped(k)
    out = _run_conv_grouped(x, kg, b, relu,
                            x.shape[-1] // (16 if wpack else 8), wpack,
                            stats=stats)
    y = out[0] if stats else out
    return out, (x, k, b, y if (relu or stats) else None)


def _bwd_folded(wpack, relu, stats, res, g):
    x, k, b, y = res
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    if relu:
        gy = jnp.where(y > 0, gy, jnp.zeros((), gy.dtype))
    # dx: flipped kernel, I/O channels swapped — flip+transpose PRESERVES
    # the fold structure (tap t's (eps, dlt) support maps to -t's), so the
    # grouped path applies to the backward conv too (merged dx+dk kernel)
    dx, dk, db = _grouped_backward(x, gy, k, wpack)
    return (dx.astype(x.dtype), dk.astype(k.dtype), db.astype(b.dtype))


conv3_stencil_folded.defvjp(_fwd_folded, _bwd_folded)


# ---------------------------------------------------------------------------
# Fused InstanceNorm+ReLU -> conv PROLOGUE ops (the north-star
# "conv+norm+activation" fusion, BASELINE.json):
#
#     y = conv3(relu(x * scale + shift), k) + b
#
# without materializing the normalized tensor — the elementwise
# normalize+relu pass between two convs (a full HBM write + read of the
# stage activation) disappears into the consumer conv's plane loads.
# scale/shift are the [B, Cin] per-(batch, channel) affine of a
# parameter-free InstanceNorm, computed upstream in XLA from x's statistics
# (a reduce-only pass); gradients flow back into x both through this VJP
# and through that stats computation.
# ---------------------------------------------------------------------------


def _dlim_ct(dlim):
    """Cotangent for the integer dlim operand (float0 when present)."""
    import numpy as _np
    return None if dlim is None else _np.zeros((2,), jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def conv3_stencil_pre(x: jax.Array, s: jax.Array, t: jax.Array,
                      k: jax.Array, b: jax.Array,
                      dlim=None, stats: bool = False):
    """conv3_stencil with the fused norm+relu prologue (dense kernels).
    dlim: optional [2] int32 valid D-plane range (spatial halo wrap).
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq)."""
    out, _ = _fwd_pre(x, s, t, k, b, dlim, stats)
    return out


def _fwd_pre(x, s, t, k, b, dlim, stats):
    out = _run_conv(x, k, b, False, pre=(s, t), dlim=dlim, stats=stats)
    y = out[0] if stats else None
    return out, (x, s, t, k, b, dlim, y)


def _bwd_pre(stats, res, g):
    x, s, t, k, b, dlim, y = res
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    k_t = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    # dx conv with the prologue backward fused as an epilogue: the mask /
    # scale / ds / dt all happen in-kernel (no XLA pass re-reading gxn)
    dx, dst = _run_conv(gy, k_t, jnp.zeros((k.shape[3],), jnp.float32),
                        False, post=(x, s, t), dlim=dlim)
    ds, dt = dst[:, 0].astype(s.dtype), dst[:, 1].astype(t.dtype)
    dk, db = _run_dk(x, gy, pre=(s, t), dlim=dlim)
    return (dx.astype(x.dtype), ds, dt, dk.astype(k.dtype),
            db.astype(b.dtype), _dlim_ct(dlim))


conv3_stencil_pre.defvjp(_fwd_pre, _bwd_pre)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 7))
def conv3_stencil_folded_pre(x: jax.Array, s: jax.Array, t: jax.Array,
                             k: jax.Array, b: jax.Array,
                             wpack: bool = False, dlim=None,
                             stats: bool = False):
    """conv3_stencil_folded (grouped-tap) with the fused norm+relu
    prologue. k: s2d-expanded fold-structured kernel; s/t: [B, Cin_folded]
    (each logical channel's affine repeated over its fold copies).
    dlim: optional [2] int32 valid D-plane range (spatial halo wrap).
    stats: also return the output's [B, 2, Cout] f32 (sum, sumsq)."""
    out, _ = _fwd_folded_pre(x, s, t, k, b, wpack, dlim, stats)
    return out


def _fwd_folded_pre(x, s, t, k, b, wpack, dlim, stats):
    kg = pack_grouped(k)
    c = x.shape[-1] // (16 if wpack else 8)
    out = _run_conv_grouped(x, kg, b, False, c, wpack, pre=(s, t),
                            dlim=dlim, stats=stats)
    y = out[0] if stats else None
    return out, (x, s, t, k, b, dlim, y)


def _bwd_folded_pre(wpack, stats, res, g):
    x, s, t, k, b, dlim, y = res
    gy = _stats_cotangent(y, g[0], g[1]) if stats else g
    # merged dx+dk kernel with the prologue backward as the dx epilogue
    dx, dk, db, dst = _grouped_backward(x, gy, k, wpack, pre=(s, t),
                                        dlim=dlim)
    ds, dt = dst[:, 0].astype(s.dtype), dst[:, 1].astype(t.dtype)
    return (dx.astype(x.dtype), ds, dt, dk.astype(k.dtype),
            db.astype(b.dtype), _dlim_ct(dlim))


conv3_stencil_folded_pre.defvjp(_fwd_folded_pre, _bwd_folded_pre)


# ---------------------------------------------------------------------------
# Fused conv + class-group softmax HEAD (the out_block): the 3^3 folded
# stencil conv's epilogue computes s2d.softmax_folded of (conv + bias)
# in-VMEM, so neither the logits nor the f32 exp tensor ever round-trip
# HBM (~1.4 ms per head softmax at b4 128^3, round-3 trace).
# ---------------------------------------------------------------------------


def _softmax_gmat(fc: int, c: int) -> jax.Array:
    blk = jnp.arange(fc) // c
    return (blk[:, None] == blk[None, :]).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3_stencil_folded_softmax(x: jax.Array, k: jax.Array, b: jax.Array,
                                 wpack: bool, n_class: int) -> jax.Array:
    """conv3_stencil_folded + bias + per-class-group softmax over the
    output lanes, fused in the kernel epilogue. Output in x.dtype ==
    s2d.softmax_folded(conv(x) + b, n_class) up to fp order."""
    y, _ = _fwd_folded_softmax(x, k, b, wpack, n_class)
    return y


def _fwd_folded_softmax(x, k, b, wpack, n_class):
    kg = pack_grouped(k)
    cout = k.shape[-1] * 8  # folded output lanes per W-half
    y = _run_conv_grouped(x, kg, b, False,
                          x.shape[-1] // (16 if wpack else 8), wpack,
                          soft_gmat=_softmax_gmat(kg.shape[-1], n_class))
    return y, (x, k, b, y)


def _bwd_folded_softmax(wpack, n_class, res, g):
    from vae_segmentation_tpu.ops.pallas.softmaxvjp import softmax_group_vjp

    x, k, b, y = res
    # softmax VJP -> conv cotangent, one fused HBM pass (softmaxvjp.py; was
    # a 2 ms/step f32 XLA chain per head site)
    dacc = softmax_group_vjp(g, y, n_class).astype(x.dtype)
    dx, dk, db = _grouped_backward(x, dacc, k, wpack)
    return dx.astype(x.dtype), dk.astype(k.dtype), db.astype(b.dtype)


conv3_stencil_folded_softmax.defvjp(_fwd_folded_softmax,
                                    _bwd_folded_softmax)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 7))
def conv3_stencil_folded_softmax_pre(x: jax.Array, s: jax.Array,
                                     t: jax.Array, k: jax.Array,
                                     b: jax.Array, wpack: bool,
                                     dlim=None, n_class: int = 2
                                     ) -> jax.Array:
    """The fused HEAD with the producing stage's norm+relu riding in as the
    kernel prologue: == conv3_stencil_folded_softmax(relu(x*s+t), k, b).
    The decoder chain's final norm before the out_block conv then never
    materializes (fwd: prologue at plane load; bwd: softmax VJP -> dx conv
    with the prologue backward as its in-kernel epilogue, dk with the
    prologue — the same machinery as conv3_stencil_folded_pre)."""
    y, _ = _fwd_folded_softmax_pre(x, s, t, k, b, wpack, dlim, n_class)
    return y


def _fwd_folded_softmax_pre(x, s, t, k, b, wpack, dlim, n_class):
    kg = pack_grouped(k)
    c = x.shape[-1] // (16 if wpack else 8)
    y = _run_conv_grouped(x, kg, b, False, c, wpack, pre=(s, t), dlim=dlim,
                          soft_gmat=_softmax_gmat(kg.shape[-1], n_class))
    return y, (x, s, t, k, y, dlim)


def _bwd_folded_softmax_pre(wpack, n_class, res, g):
    from vae_segmentation_tpu.ops.pallas.softmaxvjp import softmax_group_vjp

    x, s, t, k, y, dlim = res
    # softmax VJP -> conv cotangent, one fused HBM pass (softmaxvjp.py)
    dacc = softmax_group_vjp(g, y, n_class).astype(x.dtype)
    dx, dk, db, dst = _grouped_backward(x, dacc, k, wpack, pre=(s, t),
                                        dlim=dlim)
    ds, dt = dst[:, 0].astype(s.dtype), dst[:, 1].astype(t.dtype)
    return (dx.astype(x.dtype), ds, dt, dk.astype(k.dtype),
            db.astype(jnp.float32), _dlim_ct(dlim))


conv3_stencil_folded_softmax_pre.defvjp(_fwd_folded_softmax_pre,
                                        _bwd_folded_softmax_pre)
