"""Space-to-depth ("s2d") conv transform for small-channel stages.

Problem (BENCH.md): XLA's TPU conv emitter keeps features in the 128-lane
dimension, so the U-Net's full-resolution stages (C = 1..16) store every
activation 8-128x lane-padded and run at padded-HBM bandwidth.

Exact fix: compute those stages in a folded representation — 2x2x2 spatial
blocks moved into channels ([B, D, H, W, C] -> [B, D/2, H/2, W/2, 8C]) —
with the 3^3 stride-1 SAME conv replaced by the algebraically IDENTICAL
3^3 conv on folded tensors whose (8Cin, 8Cout) kernel is an index-expansion
of the original (Cin, Cout) weights:

    K[Δ+1][(ε, c), (δ, o)] = k[t, c, o],  t = 2Δ + ε - δ + 1, per axis,
    zero outside t ∈ {0, 1, 2}.

Derivation: y[2p+δ] = Σ_t k[t]·x[2p+δ-1+t]; substitute the source block
q = p + Δ and in-block offset ε of index 2q+ε = 2p+δ-1+t.

The model's resampling ops are natural fold boundaries:
  * Down's stride-2 2^3 conv consumes a folded tensor as a 1^3 conv
    (K1[(ε,c), o] = k[ε, c, o]) and emits the coarser resolution unfolded;
  * Up's stride-2 2^3 ConvTranspose emits a folded tensor as a 1^3 conv
    (KT[c, (δ,o)] = kT_flax[δ, c, o] — flax ConvTranspose applies the
    kernel unflipped, so tap δ IS the kernel index).

InstanceNorm/ReLU/softmax/dropout all commute with the fold (stats grouped
over the 8 in-block positions; see fold_* helpers). Parameters stay in their
original shapes — the expansion is a traced weight transform, so checkpoints
and torch conversion are untouched, and gradients flow through the
expansion (conv backward stays a plain XLA conv in folded space).

All functions are exact (up to fp reassociation); parity is tested in
tests/test_s2d.py.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

F = 2  # fold factor per axis
NB = F * F * F  # in-block positions


def fold(x: jax.Array) -> jax.Array:
    """[B, D, H, W, C] -> [B, D/2, H/2, W/2, 8C]; folded channel index is
    ((ed*2+eh)*2+ew)*C + c."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // F, F, h // F, F, w // F, F, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // F, h // F, w // F, NB * c)


def unfold(x: jax.Array) -> jax.Array:
    """Inverse of fold."""
    b, d2, h2, w2, fc = x.shape
    c = fc // NB
    x = x.reshape(b, d2, h2, w2, F, F, F, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d2 * F, h2 * F, w2 * F, c)


def _axis_map() -> np.ndarray:
    """tap[Δ+1, ε, δ] = t (or -1): the per-axis index rule."""
    m = -np.ones((3, F, F), np.int32)
    for dlt in (-1, 0, 1):
        for eps in range(F):
            for dout in range(F):
                t = F * dlt + eps - dout + 1
                if 0 <= t <= 2:
                    m[dlt + 1, eps, dout] = t
    return m


_AX = _axis_map()


def expand_kernel3(k: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> folded [3,3,3,8*Cin,8*Cout] (zeros where the
    original conv has no tap)."""
    cin, cout = k.shape[3], k.shape[4]
    out = jnp.zeros((3, 3, 3, NB * cin, NB * cout), k.dtype)
    for dd in range(3):
        for hh in range(3):
            for ww in range(3):
                for ed in range(F):
                    for eh in range(F):
                        for ew in range(F):
                            for od in range(F):
                                for oh in range(F):
                                    for ow in range(F):
                                        td = _AX[dd, ed, od]
                                        th = _AX[hh, eh, oh]
                                        tw = _AX[ww, ew, ow]
                                        if td < 0 or th < 0 or tw < 0:
                                            continue
                                        fi = ((ed * F + eh) * F + ew) * cin
                                        fo = ((od * F + oh) * F + ow) * cout
                                        out = out.at[
                                            dd, hh, ww,
                                            fi:fi + cin,
                                            fo:fo + cout,
                                        ].set(k[td, th, tw])
    return out


@functools.lru_cache()
def _expand3_mat() -> np.ndarray:
    """[27 (Δ-combo), NB (ε), NB (δ), 27 (logical tap)] 0/1 selection
    matrix of expand_kernel3: every expanded element is exactly one
    logical tap or zero, so the expansion is one small constant-matrix
    contraction instead of a gather — the gather formulation lowered to
    ~2000 tiny device ops PER STEP across the model's expansion sites
    (4.2 ms/step in the round-5 trace; dyn-slices/reshapes/copies)."""
    m = np.zeros((3, 3, 3, F, F, F, F, F, F, 27), np.float32)
    for dd in range(3):
        for hh in range(3):
            for ww in range(3):
                for ed in range(F):
                    for eh in range(F):
                        for ew in range(F):
                            for od in range(F):
                                for oh in range(F):
                                    for ow in range(F):
                                        td = _AX[dd, ed, od]
                                        th = _AX[hh, eh, oh]
                                        tw = _AX[ww, ew, ow]
                                        if td < 0 or th < 0 or tw < 0:
                                            continue
                                        tap = (td * 3 + th) * 3 + tw
                                        m[dd, hh, ww, ed, eh, ew,
                                          od, oh, ow, tap] = 1.0
    return m.reshape(27, NB, NB, 27)


@functools.lru_cache()
def _expand_w_mat() -> np.ndarray:
    """[3 (w2), F (ε), F (δ), 3 (w tap)] 0/1: the per-W-axis fold rule of
    expand_kernel_w as a selection matrix (same _AX rule, one axis)."""
    m = np.zeros((3, F, F, 3), np.float32)
    for w2 in range(3):
        for eps in range(F):
            for dlt in range(F):
                t = _AX[w2, eps, dlt]
                if t >= 0:
                    m[w2, eps, dlt, t] = 1.0
    return m


def expand_kernel3_fast(k: jax.Array) -> jax.Array:
    """Vectorized expand_kernel3 (the loop version is the readable spec;
    this is what the train step traces): one 0/1-matrix contraction —
    exact (each output element is a single tap copy; the bf16/f32 dot
    multiplies by 1.0 and sums one nonzero term)."""
    cin, cout = k.shape[3], k.shape[4]
    mat = jnp.asarray(_expand3_mat(), k.dtype)
    k27 = k.reshape(27, cin, cout)
    # [Δ, ε, δ, τ] x [τ, ci, co] -> [Δ, ε, ci, δ, co]
    out = jnp.einsum("xedt,tio->xeido", mat, k27,
                     preferred_element_type=jnp.float32).astype(k.dtype)
    return out.reshape(3, 3, 3, NB * cin, NB * cout)


def expand_fold_conv_kernel(k: jax.Array) -> jax.Array:
    """3^3 stride-1 SAME conv FUSED with the input fold: a 4^3 stride-2
    conv on the RAW [B, D, H, W, C] input emitting the folded half-res rep
    directly — y_folded[p, (δ,o)] = Σ_u x[2p+u]·k[u-δ+1], u ∈ {-1..2}
    (asymmetric pad (1, 2) per axis). Kills the fold transpose of the
    full-res input (the in_block hot path)."""
    cin, cout = k.shape[3], k.shape[4]
    # per axis: tap index t = u - δ + 1 valid in {0,1,2}
    outj = jnp.zeros((4, 4, 4, cin, NB * cout), k.dtype)
    for ud in range(-1, 3):
        for uh in range(-1, 3):
            for uw in range(-1, 3):
                for dd in range(F):
                    for dh in range(F):
                        for dw in range(F):
                            td, th, tw = ud - dd + 1, uh - dh + 1, uw - dw + 1
                            if not all(0 <= t <= 2 for t in (td, th, tw)):
                                continue
                            # folded out-channel block (δ-major)
                            fo = ((dd * F + dh) * F + dw) * cout
                            outj = outj.at[
                                ud + 1, uh + 1, uw + 1, :, fo:fo + cout
                            ].add(k[td, th, tw])
    return outj


def fold_conv(x: jax.Array, k: jax.Array, dtype=None) -> jax.Array:
    """conv3^3(x) followed by fold, as ONE stride-2 4^3 conv on raw x."""
    kf = expand_fold_conv_kernel(k)
    if dtype is not None:
        kf = kf.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, kf, (2, 2, 2), [(1, 2), (1, 2), (1, 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def expand_down_kernel(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 conv kernel [2,2,2,C,O] -> 1^3 folded kernel
    [1,1,1, 8C, O]: the Down conv consumes the folded rep directly."""
    c, o = k.shape[3], k.shape[4]
    out = k.transpose(0, 1, 2, 3, 4).reshape(NB * c, o)
    return out.reshape(1, 1, 1, NB * c, o)


def expand_down_fold_kernel(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 conv kernel [2,2,2,C,O] -> [2,2,2, 8C, 8O]: consume the
    FOLDED fine rep and emit the FOLDED coarse rep in ONE stride-2 conv —
    no unfold/fold reorg at the Down boundary.

    Derivation: folded-coarse position r, block δ packs coarse voxel 2r+δ;
    coarse voxel q reads folded-fine position q (all 8 ε blocks, the 1^3
    expand_down_kernel); so output block δ reads folded-fine 2r+δ = conv
    tap τ=δ. Block-"diagonal": tap τ writes only output block δ==τ."""
    c, o = k.shape[3], k.shape[4]
    kflat = k.reshape(NB * c, o)  # eps-major, as expand_down_kernel
    out = jnp.zeros((2, 2, 2, NB * c, NB * o), k.dtype)
    for td in range(2):
        for th in range(2):
            for tw in range(2):
                fo = ((td * F + th) * F + tw) * o
                out = out.at[td, th, tw, :, fo:fo + o].set(kflat)
    return out


def expand_down_fold_kernel_w(k: jax.Array) -> jax.Array:
    """expand_down_fold_kernel for a W-PACKED folded fine input
    [D, H, W/2, 2*8C]: stride (2,2,1), kernel (2,2,1) — the W tap pair
    lives in the eps_w2 lane blocks instead of a strided W read."""
    c, o = k.shape[3], k.shape[4]
    kflat = k.reshape(NB * c, o)
    out = jnp.zeros((2, 2, 1, WPACK * NB * c, NB * o), k.dtype)
    for td in range(2):
        for th in range(2):
            for dw in range(2):
                fo = ((td * F + th) * F + dw) * o
                out = out.at[td, th, 0,
                             dw * NB * c:(dw + 1) * NB * c,
                             fo:fo + o].set(kflat)
    return out


def expand_up_kernel(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 flax-ConvTranspose kernel [2,2,2,C,O] -> 1^3 kernel
    [1,1,1, C, 8O] emitting the folded high-res rep. flax's ConvTranspose
    (transpose_kernel=False) reaches output 2p+δ with kernel tap 1-δ per
    axis (validated in tests/test_s2d.py), hence the spatial flip."""
    c, o = k.shape[3], k.shape[4]
    kf = jnp.flip(k, axis=(0, 1, 2))
    out = kf.reshape(NB, c, o).transpose(1, 0, 2)  # [C, 8, O]
    return out.reshape(1, 1, 1, c, NB * o)


def expand_up_fold_kernel(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 flax-ConvTranspose kernel [2,2,2,C,O] -> stride-2 2^3
    ConvTranspose kernel [2,2,2, 8C, 8O] consuming the FOLDED coarse rep
    and emitting the FOLDED fine rep — no unfold at the Up boundary.

    Derivation: folded-fine position r = 2p+eps block delta reads
    k1[delta] @ coarse[r] (expand_up_kernel); coarse[r] lives in
    folded-coarse[p] block eps. As a stride-2 transpose conv over the
    folded grids, output 2p+eps takes kernel tap 1-eps per axis (the flax
    ConvTranspose flip, expand_up_kernel note), whose only nonzero input
    block is eps."""
    c, o = k.shape[3], k.shape[4]
    k1 = expand_up_kernel(k).reshape(c, NB * o)  # [C, (delta, O)]
    out = jnp.zeros((2, 2, 2, NB * c, NB * o), k.dtype)
    for ed in range(2):
        for eh in range(2):
            for ew in range(2):
                e = (ed * F + eh) * F + ew
                out = out.at[1 - ed, 1 - eh, 1 - ew,
                             e * c:(e + 1) * c, :].set(k1)
    return out


def expand_up_fold_kernel_w(k: jax.Array) -> jax.Array:
    """expand_up_fold_kernel emitting the W-PACKED folded fine rep:
    [2,2,1, 8C, 16O], strides (2,2,1). Along W the packed fine grid index
    equals the folded-coarse index ((2*pw + ew) // 2 == pw) and ew becomes
    the eps_w2 lane block — so W needs no stride, only a lane routing."""
    c, o = k.shape[3], k.shape[4]
    k1 = expand_up_kernel(k).reshape(c, NB * o)
    out = jnp.zeros((2, 2, 1, NB * c, WPACK * NB * o), k.dtype)
    for ed in range(2):
        for eh in range(2):
            for ew in range(2):
                e = (ed * F + eh) * F + ew
                out = out.at[1 - ed, 1 - eh, 0, e * c:(e + 1) * c,
                             ew * NB * o:(ew + 1) * NB * o].set(k1)
    return out


def conv3_folded(xf: jax.Array, k: jax.Array, dtype=None) -> jax.Array:
    """Folded-space equivalent of a 3^3 stride-1 SAME conv with original
    kernel k [3,3,3,Cin,Cout]. xf: [B, D/2, H/2, W/2, 8*Cin]."""
    kf = expand_kernel3_fast(k)
    if dtype is not None:
        kf = kf.astype(dtype)
    return jax.lax.conv_general_dilated(
        xf, kf, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


# ---------------------------------------------------------------------------
# "w-packing": a second fold along W only, used for folded stages whose
# channel count (NB * C) is below the 128-lane tile — at the default fmaps
# that is every 128^3-logical stage (NB * 8 = 64 lanes). Packing W-adjacent
# folded blocks into channels gives [B, D/2, H/2, W/4, 2*NB*C]: 128 full
# lanes, zero HBM padding, and MXU-shaped GEMMs for the stencil conv
# (ops/pallas/stencil3.py). Algebraically it is just fold() with factor
# (1, 1, 2) applied on top of the folded rep, so every fold_* identity
# (norm/softmax/dice grouping, conv expansion) composes unchanged.
# ---------------------------------------------------------------------------

WPACK = 2  # extra fold factor along W


def fold_w(x: jax.Array) -> jax.Array:
    """[B, D, H, W, C] -> [B, D, H, W/2, 2C]; channel index eps_w * C + c
    (position-major, same convention as fold())."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d, h, w // WPACK, WPACK, c)
    return x.reshape(b, d, h, w // WPACK, WPACK * c)


def unfold_w(x: jax.Array) -> jax.Array:
    """Inverse of fold_w."""
    b, d, h, w2, fc = x.shape
    x = x.reshape(b, d, h, w2, WPACK, fc // WPACK)
    return x.reshape(b, d, h, w2 * WPACK, fc // WPACK)


def expand_kernel_w(k: jax.Array) -> jax.Array:
    """Fold a 3-tap conv kernel [3,3,3,Ci,Co] along W by 2:
    [3,3,3, 2Ci, 2Co] with K'[.., .., dw2, (eps, ci), (dlt, co)] =
    k[.., .., t] at t = 2*dw2 + eps - dlt + 1 (zero outside 0..2) — the
    same per-axis index rule as expand_kernel3, applied to one axis."""
    ci, co = k.shape[3], k.shape[4]
    mat = jnp.asarray(_expand_w_mat(), k.dtype)  # [w2, ε, δ, t]
    # [w2, ε, δ, t] x [a, b, t, ci, co] -> [a, b, w2, ε, ci, δ, co]
    g = jnp.einsum("wedt,abtio->abweido", mat, k,
                   preferred_element_type=jnp.float32).astype(k.dtype)
    return g.reshape(3, 3, 3, WPACK * ci, WPACK * co)


def expand_up_kernel_w(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 flax-ConvTranspose kernel [2,2,2,C,O] -> [1,1,2, C, 2*NB*O]
    emitting the W-PACKED folded high-res rep from the unfolded coarse
    tensor: a width-2 stride-2 conv along W pairing the two folded output
    blocks into channels."""
    c, o = k.shape[3], k.shape[4]
    k1 = expand_up_kernel(k).reshape(c, NB * o)  # [C, 8O]
    out = jnp.zeros((1, 1, WPACK, c, WPACK * NB * o), k.dtype)
    for j in range(WPACK):
        out = out.at[0, 0, j, :, j * NB * o:(j + 1) * NB * o].set(k1)
    return out


def expand_down_kernel_w(k: jax.Array) -> jax.Array:
    """Stride-2 2^3 conv kernel [2,2,2,C,O] -> 1^3 kernel
    [1,1,1, 2*NB*C, 2O] consuming the W-PACKED folded rep and emitting the
    W-PAIRED coarse tensor (two coarse voxels per position in channels)."""
    c, o = k.shape[3], k.shape[4]
    k1 = expand_down_kernel(k).reshape(NB * c, o)
    out = jnp.zeros((1, 1, 1, WPACK * NB * c, WPACK * o), k.dtype)
    for j in range(WPACK):
        out = out.at[0, 0, 0, j * NB * c:(j + 1) * NB * c,
                     j * o:(j + 1) * o].set(k1)
    return out


def unfold_rep(x: jax.Array, c: int) -> jax.Array:
    """Undo whichever folded rep x is in (inferred from the channel count):
    [*, NB*c] -> plain unfold; [*, WPACK*NB*c] -> unfold_w then unfold."""
    fc = x.shape[-1]
    if fc == NB * c:
        return unfold(x)
    assert fc == WPACK * NB * c, (fc, c)
    return unfold(unfold_w(x))


def fold_rep(x: jax.Array, wpack: bool) -> jax.Array:
    """fold(), optionally followed by fold_w (the production 128^3 rep).

    This reorg runs inside the ingest jit (cli/common._train_ingest), where
    it fuses with the augmentation gather — as a standalone step-entry op it
    cost ~4.3 ms/step of XLA copies. (A Pallas GEMM-routed fold kernel was
    measured and rejected for the standalone case, then deleted once the
    ingest emitted pre-folded tensors; BENCH.md "Measured and EXCLUDED".)"""
    xf = fold(x)
    return fold_w(xf) if wpack else xf


def instance_norm_folded(xf: jax.Array, c: int, eps: float = 1e-5
                         ) -> jax.Array:
    """InstanceNorm over (spatial + in-block positions) per ORIGINAL
    channel: identical statistics to unfolded instance_norm.

    Written WITHOUT reshaping the big tensor: splitting the lane dim
    (8C -> [8, C]) on a full-resolution f32 upcast makes XLA materialize a
    permuted-layout copy (~300 MB each at 128^3 b4 — measured as the
    dominant copy traffic in the step trace, BENCH.md). Instead the
    spatial reduce runs on the natural [B, *, 8C] layout, the tiny [B, 8C]
    sums are regrouped to channels, and the normalize is one fused
    elementwise pass.

    Precision split: statistics accumulate in f32 (the upcast fuses into
    the reduces — never materialized), the normalize runs in the compute
    dtype. Keeping the normalize in f32 makes XLA materialize the f32
    upcast of every stage activation plus a permuted-layout copy feeding
    the next conv (~17 ms/stage at 128^3 b4, the #1 copy source in the
    round-2 trace). scale/shift are per-(B, C) f32 scalars, so the only
    rounding added is one bf16 multiply-add on values already stored in
    bf16."""
    scale, shift = instance_norm_folded_affine(xf, c, eps)
    scale = scale.astype(xf.dtype)
    shift = shift.astype(xf.dtype)
    return xf * scale[:, None, None, None, :] \
        + shift[:, None, None, None, :]


def instance_norm_folded_affine(xf: jax.Array, c: int, eps: float = 1e-5):
    """The (scale, shift) [B, 8C] f32 affine of instance_norm_folded
    WITHOUT applying it — for fusion as the prologue of the next stencil
    conv (ops/pallas/stencil3.py::conv3_stencil_folded_pre). Reduce-only:
    no full-resolution tensor is produced."""
    b = xf.shape[0]
    fc = xf.shape[-1]
    n = math.prod(xf.shape[1:-1]) * (fc // c)
    x32 = xf.astype(jnp.float32)  # consumed ONLY by the reduces -> fused
    s = jnp.sum(x32, axis=(1, 2, 3))                # [B, 8C], fused reduce
    ss = jnp.sum(jnp.square(x32), axis=(1, 2, 3))   # [B, 8C]
    s = s.reshape(b, fc // c, c).sum(axis=1)        # [B, C] (tiny)
    ss = ss.reshape(b, fc // c, c).sum(axis=1)
    mean = s / n
    var = ss / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    scale = jnp.tile(rstd, (1, fc // c))            # [B, 8C] f32
    shift = jnp.tile(-mean * rstd, (1, fc // c))
    return scale, shift


def _group_mat(fc: int, c: int) -> jax.Array:
    """G[i, j] = 1 iff lanes i, j belong to the same delta block."""
    blk = jnp.arange(fc) // c
    return (blk[:, None] == blk[None, :]).astype(jnp.float32)


def _group_sum(e: jax.Array, c: int) -> jax.Array:
    """Per-lane sums over each lane's delta-block class group, via the 0/1
    group matmul on the lane dim.

    Measured dead end (round 3): for c == 2 the partner is the adjacent
    lane, and a lane-roll + parity-select would stay inside one fusion —
    but XLA lowers the lane roll as slice+concat with f32 [.., 1]/[.., 31]
    pieces, costing ~16 ms/step vs the matmul path's ~4. The matmul's real
    cost is the f32 exp tensor materialized between fusion and dot; fixing
    THAT needs a Pallas softmax, not a roll."""
    return jax.lax.dot_general(e, _group_mat(e.shape[-1], c),
                               (((e.ndim - 1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _softmax_folded_math(xf: jax.Array, c: int) -> jax.Array:
    x32 = xf.astype(jnp.float32)
    m = jnp.max(x32, axis=-1, keepdims=True)
    e = jnp.exp(x32 - m)
    return e / _group_sum(e, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax_folded(xf: jax.Array, c: int) -> jax.Array:
    """Softmax over the original class channel inside the folded rep,
    WITHOUT reshaping the big tensor (lane-splitting reshapes materialize
    permuted-layout copies — see instance_norm_folded).

    Stability shift: the max over the WHOLE folded channel dim is one
    scalar per position, i.e. a constant within every (δ, ·) class group —
    softmax is invariant to it. The per-group exp-sum is a tiny 0/1
    group matmul on the lane dim.

    Custom VJP (rematerializing): plain autodiff saves the f32
    probabilities as the residual — a 268 MB HBM round trip per softmax at
    b4 128^3 (round-3 trace). Here the residual is the (bf16) INPUT
    logits, which the producing conv materializes anyway, and the backward
    recomputes the f32 probabilities elementwise — identical math, zero
    extra storage."""
    return _softmax_folded_math(xf, c)


def _softmax_folded_fwd(xf, c):
    return _softmax_folded_math(xf, c), xf


def _softmax_folded_bwd(c, xf, g):
    y = _softmax_folded_math(xf, c)
    g32 = g.astype(jnp.float32)
    # exact softmax VJP, group-wise: dx = (g - sum_group(g * y)) * y
    gy = _group_sum(g32 * y, c)
    return ((g32 - gy) * y).astype(xf.dtype),


softmax_folded.defvjp(_softmax_folded_fwd, _softmax_folded_bwd)
