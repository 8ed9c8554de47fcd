"""Pallas 3x3x3 SAME conv for small-channel stages — the lane-packed
stencil kernel that sidesteps XLA's feature-in-lanes conv layout.

SUPERSEDED by ops/pallas/stencil3.py (the production kernel): this
design's [H, W*C] -> [H*W, C] in-kernel view is a lane-dimension reshape
that Mosaic rejects on current toolchains ("infer-vector-layout:
unsupported shape cast"), so it only runs in interpret mode. stencil3
keeps channels in lanes end to end ([1,1,H,W,C] blocks whose [H*W, C]
collapse is layout-free) and adds the grouped-tap fold-structure path.
Kept for the interpret-mode parity tests and as design documentation.

Why: XLA's TPU conv emitter stores activations with channels in the 128-wide
lane dimension; at the U-Net's full-resolution stages (C = 1..16) that pads
every tensor 8-128x, and the whole stage runs at padded-HBM bandwidth
(BENCH.md). This kernel keeps activations in their natural row-major tiling
— planes of [H, W*C] with W*C a multiple of 128 lanes, zero padding — and
computes the conv per output plane as 27 tap-GEMMs on the MXU:

    grid (B*D,); refs x[d-1], x[d], x[d+1] as [H, W*C] lane-planes
    for each tap (dd, dh, dw):
        plane  <- sublane-roll dh, lane-roll dw*C, edge-masked
        acc   += reshape(plane, [H, W, C]) @ k[dd, dh, dw]   (MXU)

Weights/bias enter in fp32; accumulation fp32; output cast to x.dtype.
Optional fused ReLU. Custom VJP:
    dx = same kernel with k spatially flipped and I/O transposed
    dk[tap] = sum over planes of shifted_x^T @ g (tap-GEMM, accumulated
              across the sequential TPU grid into one output block)
    db = sum g
Runs in interpret mode off-TPU (parity tests in tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_plane(plane: jax.Array, dh: int, dw: int, c: int, w: int):
    """plane [H, W*C] -> plane shifted so position (h, w) reads
    (h+dh, w+dw), zero beyond the edge."""
    h_dim, wc = plane.shape
    out = plane
    if dh:
        out = jnp.roll(out, -dh, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        if dh > 0:
            out = jnp.where(rows >= h_dim - dh, 0.0, out)
        else:
            out = jnp.where(rows < -dh, 0.0, out)
    if dw:
        s = dw * c
        out = jnp.roll(out, -s, axis=1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        if dw > 0:
            out = jnp.where(lanes >= wc - s, 0.0, out)
        else:
            out = jnp.where(lanes < -s, 0.0, out)
    return out


def _conv_plane_kernel(xm_ref, x0_ref, xp_ref, k_ref, b_ref, o_ref, *,
                       h: int, w: int, cin: int, cout: int, d: int,
                       relu: bool):
    """One output plane: acc[H*W, Cout] = sum over taps."""
    plane_idx = pl.program_id(0)
    dloc = plane_idx % d  # depth index within the volume

    acc = jnp.zeros((h * w, cout), jnp.float32)
    refs = (xm_ref, x0_ref, xp_ref)
    for dd in (-1, 0, 1):
        src = refs[dd + 1][0].astype(jnp.float32)  # [H, W*C]
        valid = jnp.where(
            (dloc + dd < 0) | (dloc + dd > d - 1), 0.0, 1.0)
        src = src * valid
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                shifted = _shift_plane(src, dh, dw, cin, w)
                a = shifted.reshape(h * w, cin)
                acc += jax.lax.dot_general(
                    a, k_ref[dd + 1, dh + 1, dw + 1],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(h, w * cout).astype(o_ref.dtype)


def _run_conv(x: jax.Array, k: jax.Array, b: jax.Array, relu: bool):
    """x [B, D, H, W, Cin], k [3,3,3,Cin,Cout] fp32, b [Cout] fp32."""
    bsz, d, h, w, cin = x.shape
    cout = k.shape[-1]
    assert (w * cin) % LANES == 0 and (w * cout) % LANES == 0, (w, cin, cout)
    xf = x.reshape(bsz * d, h, w * cin)

    def idx(off):
        # clamped neighbor plane; the kernel masks the out-of-volume case
        def f(i):
            base = (i // d) * d
            return (jnp.clip(i + off, base, base + d - 1), 0, 0)
        return f

    plane_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, h, w * cin), idx(off), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_conv_plane_kernel, h=h, w=w, cin=cin, cout=cout,
                          d=d, relu=relu),
        grid=(bsz * d,),
        in_specs=[
            plane_spec(-1), plane_spec(0), plane_spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias [1, Cout]
        ],
        out_specs=pl.BlockSpec((1, h, w * cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz * d, h, w * cout), x.dtype),
        interpret=_interpret(),
    )(xf, xf, xf, k.astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32))
    return out.reshape(bsz, d, h, w, cout)


def _dk_kernel(xm_ref, x0_ref, xp_ref, g_ref, dk_ref, db_ref, acc_ref,
               bacc_ref, *, h: int, w: int, cin: int, cout: int, d: int,
               n_planes: int, relu_mask: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        bacc_ref[...] = jnp.zeros_like(bacc_ref)

    dloc = i % d
    g = g_ref[0].astype(jnp.float32).reshape(h * w, cout)
    refs = (xm_ref, x0_ref, xp_ref)
    for dd in (-1, 0, 1):
        src = refs[dd + 1][0].astype(jnp.float32)
        valid = jnp.where((dloc + dd < 0) | (dloc + dd > d - 1), 0.0, 1.0)
        src = src * valid
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                shifted = _shift_plane(src, dh, dw, cin, w)
                a = shifted.reshape(h * w, cin)
                tap = 9 * (dd + 1) + 3 * (dh + 1) + (dw + 1)
                acc_ref[tap] += jax.lax.dot_general(
                    a, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    bacc_ref[0] += jnp.sum(g, axis=0)

    @pl.when(i == n_planes - 1)
    def _():
        dk_ref[...] = acc_ref[...]
        db_ref[...] = bacc_ref[...]


def _run_dk(x: jax.Array, g: jax.Array, cin: int, cout: int):
    bsz, d, h, w, _ = x.shape
    xf = x.reshape(bsz * d, h, w * cin)
    gf = g.reshape(bsz * d, h, w * cout)
    n = bsz * d

    def idx(off):
        def f(i):
            base = (i // d) * d
            return (jnp.clip(i + off, base, base + d - 1), 0, 0)
        return f

    dk, db = pl.pallas_call(
        functools.partial(_dk_kernel, h=h, w=w, cin=cin, cout=cout, d=d,
                          n_planes=n, relu_mask=False),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w * cin), idx(-1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w * cin), idx(0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w * cin), idx(1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w * cout), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((27, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((27, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((27, cin, cout), jnp.float32),
            pltpu.VMEM((1, cout), jnp.float32),
        ],
        interpret=_interpret(),
    )(xf, xf, xf, gf)
    return dk.reshape(3, 3, 3, cin, cout), db.reshape(cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3_pallas(x: jax.Array, k: jax.Array, b: jax.Array,
                 relu: bool = False) -> jax.Array:
    """3^3 stride-1 SAME conv (+bias, optional fused ReLU) on
    [B, D, H, W, C] with unpadded lane-packed planes. Requires
    W*Cin and W*Cout to be multiples of 128."""
    y, _ = _fwd(x, k, b, relu)
    return y


def _fwd(x, k, b, relu):
    y = _run_conv(x, k, b, relu)
    return y, (x, k, b, y if relu else None)


def _bwd(relu, res, gy):
    x, k, b, y = res
    if relu:
        gy = jnp.where(y > 0, gy, jnp.zeros((), gy.dtype))
    # dx: correlate g with flipped kernel, swapped in/out channels
    k_t = jnp.flip(k, axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dx = _run_conv(gy, k_t, jnp.zeros((k.shape[3],), jnp.float32), False)
    dk, db = _run_dk(x, gy, k.shape[3], k.shape[4])
    return (dx.astype(x.dtype), dk.astype(k.dtype), db.astype(b.dtype))


conv3_pallas.defvjp(_fwd, _bwd)
