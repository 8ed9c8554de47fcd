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
    db = sum(g) over all but the channel axis (XLA reduce)

Parity: tests/test_stencil3.py (interpret mode on CPU, plus the s2d
algebraic equivalence). Reference behavior target: the stride-1 SAME conv
of joint_model.py:35-52/101-112 composed with the s2d fold (exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


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


def _conv_kernel(xm_ref, x0_ref, xp_ref, k_ref, b_ref, o_ref, *,
                 h: int, w: int, cin: int, cout: int, d: int, relu: bool):
    """One output plane [H, W, Cout] = sum of 9 tap-GEMMs [H*W,3C]@[3C,Cout]
    over the 3 depth taps."""
    dloc = pl.program_id(1)
    acc = jnp.zeros((h * w, cout), jnp.float32) + b_ref[0:1, :]
    refs = (xm_ref, x0_ref, xp_ref)
    for dd in (-1, 0, 1):
        plane = refs[dd + 1][0, 0].reshape(h * w, cin)
        if dd:
            # zero the out-of-volume depth tap (index_map clamps the block)
            valid = jnp.logical_and(dloc + dd >= 0, dloc + dd <= d - 1)
            plane = plane * jnp.where(valid, 1.0, 0.0).astype(plane.dtype)
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
    o_ref[0, 0] = acc.reshape(h, w, cout).astype(o_ref.dtype)


def _pack_kernel(k: jax.Array) -> jax.Array:
    """[3,3,3,Cin,Cout] -> [3(dd), 3(dh), 3*Cin, Cout]: the dw taps stacked
    along the contraction dim to match _shifted3's lane concat."""
    return k.reshape(3, 3, 3 * k.shape[3], k.shape[4])


def _plane_spec(off: int, d: int, h: int, w: int, c: int):
    def idx(b, i):
        return (b, jnp.clip(i + off, 0, d - 1), 0, 0, 0)
    return pl.BlockSpec((1, 1, h, w, c), idx, memory_space=pltpu.VMEM)


def _run_conv(x: jax.Array, k: jax.Array, b: jax.Array, relu: bool):
    """x [B, D, H, W, Cin]; k [3,3,3,Cin,Cout]; b [Cout] f32."""
    bsz, d, h, w, cin = x.shape
    cout = k.shape[-1]
    assert w % 8 == 0, w  # [H, W, C] -> [H*W, C] collapse must be layout-free
    kp = _pack_kernel(k).astype(x.dtype)
    return pl.pallas_call(
        functools.partial(_conv_kernel, h=h, w=w, cin=cin, cout=cout, d=d,
                          relu=relu),
        grid=(bsz, d),
        in_specs=[
            _plane_spec(-1, d, h, w, cin),
            _plane_spec(0, d, h, w, cin),
            _plane_spec(1, d, h, w, cin),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # packed weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [1, Cout] f32
        ],
        out_specs=pl.BlockSpec((1, 1, h, w, cout),
                               lambda bi, i: (bi, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d, h, w, cout), x.dtype),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            # the widest stage (Cin=256 up5 entry at 64^3) sits at ~16.1 MB
            # with double-buffered planes; the default scoped limit is a
            # conservative 16 MB, well under the hardware VMEM
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    )(x, x, x, kp, b.reshape(1, -1).astype(jnp.float32))


def _dk_kernel(xm_ref, x0_ref, xp_ref, g_ref, dk_ref, acc_ref, *,
               h: int, w: int, cin: int, cout: int, d: int, n: int):
    """dk[dd, dh, 3Cin, Cout] += A3(x, dd, dh)^T @ g, accumulated across the
    sequential (B, D) grid in f32 scratch."""
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    dloc = pl.program_id(1)
    g = g_ref[0, 0].reshape(h * w, cout)
    refs = (xm_ref, x0_ref, xp_ref)
    for dd in (-1, 0, 1):
        plane = refs[dd + 1][0, 0].reshape(h * w, cin)
        if dd:
            valid = jnp.logical_and(dloc + dd >= 0, dloc + dd <= d - 1)
            plane = plane * jnp.where(valid, 1.0, 0.0).astype(plane.dtype)
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
                    _shifted3(plane, dh, w), g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

    @pl.when(step == n - 1)
    def _():
        dk_ref[...] = acc_ref[...]


def _run_dk(x: jax.Array, g: jax.Array):
    bsz, d, h, w, cin = x.shape
    cout = g.shape[-1]
    dk = pl.pallas_call(
        functools.partial(_dk_kernel, h=h, w=w, cin=cin, cout=cout, d=d,
                          n=bsz * d),
        grid=(bsz, d),
        in_specs=[
            _plane_spec(-1, d, h, w, cin),
            _plane_spec(0, d, h, w, cin),
            _plane_spec(1, d, h, w, cin),
            pl.BlockSpec((1, 1, h, w, cout),
                         lambda bi, i: (bi, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, 3 * cin, cout),
                               lambda bi, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, 3 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, 3, 3 * cin, cout), jnp.float32)],
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    )(x, x, x, g)
    # [3, 3, 3Cin, Cout] -> [3,3,3,Cin,Cout] (undo the dw lane-stack)
    return dk.reshape(3, 3, 3, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3_stencil(x: jax.Array, k: jax.Array, b: jax.Array,
                  relu: bool = False) -> jax.Array:
    """3^3 stride-1 SAME conv + bias (optional fused ReLU) on
    [B, D, H, W, C], lane-native (W % 8 == 0; C should be a multiple of
    the lane tile for full efficiency). k may be bf16 or f32."""
    y, _ = _fwd(x, k, b, relu)
    return y


def _fwd(x, k, b, relu):
    y = _run_conv(x, k, b, relu)
    return y, (x, k, b, y if relu else None)


def _bwd(relu, res, gy):
    x, k, b, y = res
    if relu:
        gy = jnp.where(y > 0, gy, jnp.zeros((), gy.dtype))
    k_t = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _run_conv(gy, k_t, jnp.zeros((k.shape[3],), jnp.float32), False)
    dk = _run_dk(x, gy)
    db = jnp.sum(gy, axis=(0, 1, 2, 3), dtype=jnp.float32)
    return (dx.astype(x.dtype), dk.astype(k.dtype), db.astype(b.dtype))


conv3_stencil.defvjp(_fwd, _bwd)
