"""Conv building blocks, TPU-first.

Structural parity targets (reference joint_model.py):
  * Normalization switch (InstanceNorm3d/BatchNorm3d/GSNorm3d) — joint_model.py:9-15
  * DoubleConv = 3x (conv3^3 + norm + ReLU)                    — joint_model.py:35-52
  * Conv       = conv3^3 + norm + ReLU                          — joint_model.py:101-112
  * Down       = strided 2^3 conv (ch-preserving) + DoubleConv  — joint_model.py:126-136
  * Up         = ConvTranspose3d 2^3 (ch-preserving) + DoubleConv — joint_model.py:114-124
  * GSNorm3d group-sum norm                                     — joint_model.py:17-33

TPU-first decisions (not a translation):
  * channels-LAST layout [B, D, H, W, C] so XLA tiles convs onto the MXU with
    the lane dimension on channels;
  * compute dtype bf16 for convs (param dtype fp32), fp32 for normalization
    statistics and softmax;
  * InstanceNorm has no params and no running stats, matching torch's
    nn.InstanceNorm3d(affine=False, track_running_stats=False) defaults used
    by the reference — eval mode equals train mode by construction;
  * torch-matching init (kaiming_uniform(a=sqrt5) == U(+-1/sqrt(fan_in)))
    so training dynamics are comparable out of the box.
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def use_s2d() -> bool:
    """Space-to-depth default for the lane-starved conv stages: ON on TPU
    (the whole point, see ops/s2d.py), opt-in/out via VAESEG_S2D."""
    env = os.environ.get("VAESEG_S2D")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


_STENCIL_FORCE_OFF = False
_STENCIL_MESH = None


def set_stencil_enabled(on: bool) -> None:
    """Library-level force-off gate for the stencil conv path (used by
    probes for A/B measurements). The CLIs no longer need it: spatial
    meshes keep the stencil live via the halo-exchange shard_map
    (stencil_shard_wrap)."""
    global _STENCIL_FORCE_OFF
    _STENCIL_FORCE_OFF = not on


def set_stencil_mesh(mesh) -> None:
    """Run each pallas stencil conv per shard by wrapping it in shard_map
    over the active mesh. DP-only meshes split the batch dim (the pallas
    grid's leading dim — per-shard execution is exact as-is). Meshes with a
    'spatial' axis additionally split the D axis; the 3^3 conv's depth taps
    then need the neighbour shards' boundary planes, which the wrap
    exchanges with `lax.ppermute` before the kernel runs (SURVEY.md §2.2's
    halo-exchange mechanism). Called by cli/common.make_mesh_if_multichip;
    None clears."""
    global _STENCIL_MESH
    _STENCIL_MESH = mesh


def get_stencil_mesh():
    """The active mesh registered by cli/common.make_mesh_if_multichip (or
    None). Consumed by every Pallas-op shard wrap — the stencil/bridge wraps
    below and the fused loss kernels (ops/pallas/dicesums.py,
    ops/pallas/reparam.py), which must not reach GSPMD as opaque
    pallas_calls on a multi-chip mesh (it would all-gather their
    full-resolution operands)."""
    return _STENCIL_MESH


def stencil_stats_ok() -> bool:
    """Whether the in-kernel stats epilogue (sum/sumsq outputs feeding the
    instance-norm affine) is usable under the active mesh: stats are
    per-batch-element, so batch ('data') sharding splits them cleanly, and
    since round 4 spatial meshes keep them too — the wrap subtracts the
    halo output planes' contribution and psums the per-slab partials
    (_stats_slab_correct), so the epilogue's ~3%/step win survives the
    flagship DP4xSP2 mesh (round-3 verdict Weak #3)."""
    return True


def _pad_slab_bd(x_pad):
    """Round the halo-extended D-slab up to a multiple of 8 so the stencil
    kernels can D-block it. The slab depth D/n_sp + 2 (e.g. the flagship
    DP4xSP2 128^3 stage: 34 = 2*17) almost never divides by the kernel's
    block sizes, capping bd at 2 (or 1) — measured 7-9x worse per useful
    plane than the one-chip bd=8 launch shape
    (tools/probes/sp_shard_kernel_time.py). The appended zero planes are
    masked inputs (dlim for the prologue kernels; literal zeros — i.e. the
    conv's own SAME padding — for the plain ones), their outputs are
    sliced away, and their stats contribution is subtracted in
    _stats_slab_correct. Returns (padded, original_depth)."""
    d2 = x_pad.shape[1]
    d_t = -(-d2 // 8) * 8
    if d_t == d2:
        return x_pad, d2
    pad = [(0, 0)] * x_pad.ndim
    pad[1] = (0, d_t - d2)
    return jnp.pad(x_pad, pad), d2


def _stats_slab_correct(y_padded, st, d2):
    """Per-slab stats -> global stats under the spatial halo wrap: the
    kernel accumulated (sum, sumsq) over ALL output planes of the padded
    slab, but plane 0 and plane d2-1 are the halo (duplicates of the
    neighbour's boundary outputs, or zero-padding garbage at the volume
    edges) and planes >= d2 are the bd-alignment pad (_pad_slab_bd); all
    are sliced away from the returned activation. Subtract what the two
    halo planes contributed plus the pad planes' contribution: pad plane
    d2 still sees the real last halo plane through its depth-(-1) tap, but
    every deeper pad plane's inputs are all masked/zero, making planes
    d2+1..end IDENTICAL (the biased/activated zero-conv) — read one and
    scale by n_pad-1. Reads <=4 of the stored planes — the bulk of the
    activation is never re-read. Then psum the per-slab partials over
    'spatial'. The
    consumer divides by the GLOBAL spatial count (affine_from_stats is
    called at the jit level where shapes are logical), so the result
    matches the unsharded epilogue up to summation order."""
    lo = y_padded[:, 0].astype(jnp.float32)
    hi = y_padded[:, d2 - 1].astype(jnp.float32)
    corr = jnp.stack([
        jnp.sum(lo, axis=(1, 2)) + jnp.sum(hi, axis=(1, 2)),
        jnp.sum(lo * lo, axis=(1, 2)) + jnp.sum(hi * hi, axis=(1, 2)),
    ], axis=1)
    n_pad = y_padded.shape[1] - d2
    if n_pad:
        pp = y_padded[:, d2].astype(jnp.float32)
        corr = corr + jnp.stack([
            jnp.sum(pp, axis=(1, 2)), jnp.sum(pp * pp, axis=(1, 2))],
            axis=1)
    if n_pad > 1:
        pz = y_padded[:, d2 + 1].astype(jnp.float32)
        corr = corr + (n_pad - 1) * jnp.stack([
            jnp.sum(pz, axis=(1, 2)), jnp.sum(pz * pz, axis=(1, 2))],
            axis=1)
    return jax.lax.psum(st - corr, "spatial")


def stencil_shard_wrap(fn, stats: bool = False):
    """Wrap a stencil conv op (x, k, b) -> y for the active DP mesh, if
    any: x/y batch-sharded over 'data', weights/bias replicated.
    stats: fn returns (y, stats) — both batch-sharded (DP meshes only).

    Shape-aware: batches that don't split evenly over the 'data' axis
    (val_batch=1 eval, ragged last val batches, per-case ft1 finetune —
    every DP-mesh run hits at least one of these at its first validation
    pass) fall back to the unwrapped op and let XLA place it."""
    if _STENCIL_MESH is None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = _STENCIL_MESH
    n_data = mesh.shape["data"]
    n_sp = mesh.shape.get("spatial", 1)

    if n_sp == 1:
        sharded = shard_map(fn, mesh=mesh, in_specs=(P("data"), P(), P()),
                            out_specs=(P("data"), P("data")) if stats
                            else P("data"), check_vma=False)
    else:
        # D-axis halo exchange: each shard computes the conv on its D-slab
        # padded with the neighbours' boundary planes. ppermute leaves the
        # edge shards' missing neighbour as zeros — exactly the conv's
        # SAME zero padding. Slicing [1:-1] of the SAME-conv output of the
        # padded slab is the exact global conv restricted to the slab.
        send_down = [(i, i + 1) for i in range(n_sp - 1)]
        send_up = [(i + 1, i) for i in range(n_sp - 1)]

        def halo_fn(x, k, b):
            xm = jax.lax.ppermute(x[:, -1:], "spatial", send_down)
            xp = jax.lax.ppermute(x[:, :1], "spatial", send_up)
            slab, d2 = _pad_slab_bd(jnp.concatenate([xm, x, xp], axis=1))
            out = fn(slab, k, b)
            if stats:
                y, st = out
                return y[:, 1:d2 - 1], _stats_slab_correct(y, st, d2)
            return out[:, 1:d2 - 1]

        sharded = shard_map(halo_fn, mesh=mesh,
                            in_specs=(P("data", "spatial"), P(), P()),
                            out_specs=(P("data", "spatial"), P("data"))
                            if stats else P("data", "spatial"),
                            check_vma=False)

    def dispatch(x, k, b):
        if x.shape[0] % n_data != 0 or x.shape[1] % n_sp != 0:
            return fn(x, k, b)
        return sharded(x, k, b)

    return dispatch


def bridge_shard_wrap(fn):
    """stencil_shard_wrap for the folded Up bridge (ops/pallas/upbridge.py):
    a stride-2 upsampling is plane-local in D (output planes 2p, 2p+1
    depend only on input plane p), so batch AND spatial axes split with no
    halo exchange. Same ragged-shape fallback as stencil_shard_wrap."""
    if _STENCIL_MESH is None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = _STENCIL_MESH
    n_data = mesh.shape["data"]
    n_sp = mesh.shape.get("spatial", 1)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P("data", "spatial"), P(), P()),
                        out_specs=P("data", "spatial"), check_vma=False)

    def dispatch(x, k, b):
        # per-shard D must stay plane-pair aligned (the down bridge
        # consumes D pairs; the up bridge accepts any per-shard size)
        if x.shape[0] % n_data != 0 or x.shape[1] % (2 * n_sp) != 0:
            return fn(x, k, b)
        return sharded(x, k, b)

    return dispatch


def bridge_shard_wrap_pre(fn):
    """bridge_shard_wrap for the prologue Down bridge (x, s, t, k, b):
    s/t are per-(batch, lane) affines — sharded over 'data'. No halos
    (plane-pair local), same ragged fallback."""
    if _STENCIL_MESH is None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = _STENCIL_MESH
    n_data = mesh.shape["data"]
    n_sp = mesh.shape.get("spatial", 1)
    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P("data", "spatial"), P("data"), P("data"), P(), P()),
        out_specs=P("data", "spatial"), check_vma=False)

    def dispatch(x, sc, sh, k, b):
        if x.shape[0] % n_data != 0 or x.shape[1] % (2 * n_sp) != 0:
            return fn(x, sc, sh, k, b)
        return sharded(x, sc, sh, k, b)

    return dispatch


def stencil_shard_wrap_pre(fn, stats: bool = False):
    """stencil_shard_wrap for the fused-prologue ops (x, scale, shift, k,
    b): scale/shift are per-(batch, channel) [B, C] — sharded over 'data',
    no spatial dim. Under spatial meshes the halo wrap passes the per-shard
    dlim valid-plane range: the prologue maps ppermute's zero fill to
    relu(shift) != 0, so edge shards must mask their missing-neighbour
    halo INSIDE the kernel (after the prologue) instead."""
    if _STENCIL_MESH is None:
        return fn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = _STENCIL_MESH
    n_data = mesh.shape["data"]
    n_sp = mesh.shape.get("spatial", 1)

    if n_sp == 1:
        sharded = shard_map(
            fn, mesh=mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P()),
            out_specs=(P("data"), P("data")) if stats else P("data"),
            check_vma=False)
    else:
        send_down = [(i, i + 1) for i in range(n_sp - 1)]
        send_up = [(i + 1, i) for i in range(n_sp - 1)]

        def halo_fn(x, s, t, k, b):
            xm = jax.lax.ppermute(x[:, -1:], "spatial", send_down)
            xp = jax.lax.ppermute(x[:, :1], "spatial", send_up)
            idx = jax.lax.axis_index("spatial")
            d2 = x.shape[1] + 2
            # dlim's hi stays at the pre-pad slab end, so the bd-alignment
            # pad planes (>= d2) are masked like the missing-neighbour halo
            dlim = jnp.stack([
                jnp.where(idx == 0, 1, 0),
                jnp.where(idx == n_sp - 1, d2 - 2, d2 - 1),
            ]).astype(jnp.int32)
            slab, _ = _pad_slab_bd(jnp.concatenate([xm, x, xp], axis=1))
            out = fn(slab, s, t, k, b, dlim=dlim)
            if stats:
                y, st = out
                return y[:, 1:d2 - 1], _stats_slab_correct(y, st, d2)
            return out[:, 1:d2 - 1]

        sharded = shard_map(
            halo_fn, mesh=mesh,
            in_specs=(P("data", "spatial"), P("data"), P("data"), P(), P()),
            out_specs=(P("data", "spatial"), P("data")) if stats
            else P("data", "spatial"), check_vma=False)

    def dispatch(x, s, t, k, b):
        if x.shape[0] % n_data != 0 or x.shape[1] % n_sp != 0:
            return fn(x, s, t, k, b)
        return sharded(x, s, t, k, b)

    return dispatch


def use_stencil() -> bool:
    """Route folded 3^3 convs through the Pallas stencil kernel
    (ops/pallas/stencil3.py) — ON by default on TPU, where it runs the
    folded stages at ~MXU peak vs the conv emitter's tap-expanded fusions
    (BENCH.md round 2). Off-TPU the XLA folded conv is used (the kernel
    itself still runs in interpret mode for tests). VAESEG_STENCIL=0/1
    overrides."""
    if _STENCIL_FORCE_OFF:
        return False
    env = os.environ.get("VAESEG_STENCIL")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def use_fused_prologue() -> bool:
    """Fuse each intra-DoubleConv InstanceNorm+ReLU into the NEXT stencil
    conv as an in-kernel prologue (ops/pallas/stencil3.py::*_pre) — the
    north-star conv+norm+activation fusion. The elementwise normalize pass
    (a full HBM write + read of the stage activation between two convs)
    collapses into a reduce-only stats pass. ON whenever the stencil path
    is; VAESEG_FUSE=0/1 overrides for A/B measurement."""
    env = os.environ.get("VAESEG_FUSE")
    if env is not None:
        return env == "1"
    return True


def instance_norm_affine(x: jax.Array, eps: float = 1e-5):
    """The (scale, shift) [B, C] f32 affine of parameter-free InstanceNorm
    WITHOUT applying it — reduce-only, for the fused conv prologue."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2, 3))
    var = jnp.var(x32, axis=(1, 2, 3))
    rstd = jax.lax.rsqrt(var + eps)
    return rstd, -mean * rstd


def affine_from_stats(st: jax.Array, n_spatial: int, c: int,
                      eps: float = 1e-5):
    """Instance-norm (scale, shift) [B, FC] f32 affine from a stencil
    conv's in-kernel (sum, sumsq) stats output [B, 2, FC] — no reduce pass
    over the activation. c: the ORIGINAL channel count (fold copies
    grouped exactly as s2d.instance_norm_folded_affine; FC == c for
    unfolded tensors). n_spatial: number of positions per (batch, folded
    channel), i.e. prod of the tensor's D/H/W dims."""
    ssum, ssq = st[:, 0], st[:, 1]
    b, fc = ssum.shape
    g = fc // c
    s = ssum.reshape(b, g, c).sum(axis=1)
    q = ssq.reshape(b, g, c).sum(axis=1)
    n = n_spatial * g
    mean = s / n
    var = q / n - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    return jnp.tile(rstd, (1, g)), jnp.tile(-mean * rstd, (1, g))


def apply_affine_relu(x: jax.Array, aff) -> jax.Array:
    """Apply a deferred norm affine + ReLU (the consumer-side fallback for
    DoubleConv/Up/ConvNormAct.defer_affine when no kernel prologue can
    take it — e.g. an active dropout between stage and head)."""
    s, t = aff
    return jnp.maximum(
        x * s.astype(x.dtype)[:, None, None, None, :]
        + t.astype(x.dtype)[:, None, None, None, :],
        jnp.zeros((), x.dtype))


def stencil_takes(shape, mode: str) -> bool:
    """Would Conv3 route a 3^3/s1/SAME conv on this input through the
    stencil kernel? Mirrors the conditions in Conv3.__call__ — used by
    DoubleConv to decide whether the norm+relu after the PREVIOUS conv can
    ride into the next conv as a fused prologue."""
    if not use_stencil():
        return False
    if mode == "normal":
        return shape[-1] >= 32 and shape[3] >= 16 and shape[3] % 8 == 0
    if mode == "folded":
        return shape[3] % 8 == 0
    return False


def use_pallas_norm() -> bool:
    """Route InstanceNorm+ReLU through the fused Pallas kernel
    (ops/pallas/instance_norm.py) when VAESEG_PALLAS=1.

    OFF by default after measurement: at the network level the pallas_call
    boundaries force layout conversions of the lane-padded conv activations
    (XLA stores C=8 channels-last tensors 16x padded to the 128-lane tile),
    costing +60% on the Seg forward (147 ms XLA-fused vs 238 ms Pallas at
    128^3 batch 4, probe 2026-08-16). XLA's own fusion of mean/var/
    normalize/relu into the conv consumers is layout-native and wins. The
    kernels stay maintained (tests/test_pallas.py) for layouts where they
    pay off and as the north-star fused-op artifact."""
    return os.environ.get("VAESEG_PALLAS") == "1"

# Feature maps used by every model in the zoo (joint_model.py:207,276,352,395).
DEFAULT_FMAPS = (8, 16, 32, 64, 128, 256)


def stage_wpack(fmaps: Sequence[int] = DEFAULT_FMAPS) -> bool:
    """Whether the full-resolution folded stages use the W-PACKED rep
    (s2d.fold_w): pack when the folded channel count (8 * fmaps[0]) is below
    the 128-lane tile, so the stage tensors fill the lanes exactly."""
    from vae_segmentation_tpu.ops import s2d

    return s2d.NB * fmaps[0] < 128


def torch_uniform_init(fan_in_from: str = "conv"):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — what torch's default
    kaiming_uniform_(a=sqrt(5)) evaluates to for conv/linear weights, and what
    torch uses for biases.

    fan_in_from:
      'conv'      — kernel [*k, in, out]: fan_in = prod(k) * in
      'transpose' — kernel [*k, in, out] of a ConvTranspose: torch computes
                    fan_in from dim 1 of its (in, out, *k) weight, i.e.
                    prod(k) * out
      'dense'     — kernel [in, out]: fan_in = in
    """

    def init(key, shape, dtype=jnp.float32):
        if fan_in_from == "dense":
            fan_in = shape[0]
        elif fan_in_from == "transpose":
            fan_in = math.prod(shape[:-2]) * shape[-1]
        else:
            fan_in = math.prod(shape[:-1])
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameter-free InstanceNorm over spatial dims of [B, D, H, W, C].

    torch nn.InstanceNorm3d(C) defaults: affine=False, no running stats,
    eps=1e-5, biased variance (joint_model.py:11). Statistics accumulate in
    fp32 (the upcast fuses into the reduces); the normalize runs in the
    compute dtype — a f32 normalize makes XLA materialize a full f32 copy
    of the activation plus a layout permute feeding the next conv (see
    ops/s2d.py::instance_norm_folded). scale/shift are per-(B, C) f32
    scalars, so only one bf16 multiply-add of rounding is added."""
    x32 = x.astype(jnp.float32)  # consumed only by the reduces -> fused
    mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    scale = rstd.astype(x.dtype)
    shift = (-mean * rstd).astype(x.dtype)
    return x * scale + shift


def gs_norm(x: jax.Array, num_group: int = 1, eps: float = 1e-4) -> jax.Array:
    """Group-sum normalization (joint_model.py:17-33): within each channel
    group, divide by the sum over channels (+1e-4)."""
    b, d, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, d, h, w, num_group, c // num_group)
    denom = jnp.sum(x32, axis=-1, keepdims=True) + eps
    return (x32 / denom).reshape(b, d, h, w, c).astype(x.dtype)


class Norm(nn.Module):
    """Normalization dispatch (joint_model.py:9-15). norm_type: 1=instance,
    2=batch (BatchNorm3d, momentum=0.1 — joint_model.py:12-13), 3=gsnorm.
    The shipped recipes only ever use norm_type=1; the BatchNorm branch
    exists for library parity. Its running statistics live in the flax
    `batch_stats` collection (callers init/apply with
    mutable=["batch_stats"] when training); `use_running_average` plays
    torch's eval-mode role. torch momentum=0.1 means
    running <- 0.9*running + 0.1*batch, i.e. flax momentum=0.9."""

    norm_type: int = 1
    num_group: int = 1
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        if self.norm_type == 1:
            return instance_norm(x)
        if self.norm_type == 2:
            return nn.BatchNorm(
                use_running_average=self.use_running_average,
                momentum=0.9, epsilon=1e-5, dtype=x.dtype,
                param_dtype=jnp.float32)(x)
        if self.norm_type == 3:
            return gs_norm(x, self.num_group)
        raise ValueError(f"unknown norm_type={self.norm_type}")


def _act(soft: bool):
    return jax.nn.softplus if soft else jax.nn.relu


def _norm_act(x: jax.Array, norm_type: int, soft: bool,
              folded_c: int = 0) -> jax.Array:
    """norm + activation. folded_c > 0: x is a space-to-depth rep with
    folded_c original channels (stats grouped accordingly). The fused
    Pallas kernel handles the InstanceNorm+ReLU pair when enabled."""
    if folded_c:
        from vae_segmentation_tpu.ops import s2d

        assert norm_type == 1, "s2d supports InstanceNorm stages only"
        x = s2d.instance_norm_folded(x, folded_c)
        return _act(soft)(x)
    if norm_type == 1 and not soft and use_pallas_norm():
        from vae_segmentation_tpu.ops.pallas import instance_norm_act

        return instance_norm_act(x, True)
    x = Norm(norm_type)(x)
    return _act(soft)(x)


def use_fast_dropout() -> bool:
    """Generate MC-dropout masks with the backend's hardware RNG
    (lax.rng_bit_generator) instead of threefry — threefry costs ~10 VPU
    ops per element and showed up as ~2 ms/step of mask fusions in the
    round-3 trace. The stream differs from threefry but is equally valid
    MC sampling (like the fused reparam kernel's TPU PRNG) and is
    deterministic per key on a given backend. VAESEG_FAST_DROPOUT=0/1
    overrides; default ON on TPU."""
    env = os.environ.get("VAESEG_FAST_DROPOUT")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def mc_dropout(module: nn.Module, x: jax.Array, rate: float) -> jax.Array:
    """Functional MC dropout, always active when rate > 0 — the semantics of
    torch F.dropout(p, training=True) as used for decoder/seg MC sampling
    (joint_model.py:256-264,379-387). Draws from the module's 'dropout' RNG
    stream."""
    if not rate:
        return x
    key = module.make_rng("dropout")
    if use_fast_dropout():
        kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
        state = jnp.zeros((4,), jnp.uint32).at[-kd.shape[0]:].set(kd)
        _, bits = jax.lax.rng_bit_generator(state, x.shape,
                                            dtype=jnp.uint32)
        thr = jnp.uint32(min(int(round(rate * 2 ** 32)), 2 ** 32 - 1))
        keep = bits >= thr  # P(bits < thr) == rate
    else:
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class Conv3(nn.Module):
    """3^3 same-padding conv with torch-style init.

    Owns its kernel/bias params directly (path: .../Conv3_i/{kernel,bias})
    so the space-to-depth path can re-expand the SAME weights
    (ops/s2d.py). mode:
      'normal'       — plain conv on [B, D, H, W, C];
      'folded'       — 3^3 SAME stride-1 conv on the folded rep
                       [B, D/2, H/2, W/2, 8C] via expand_kernel3_fast;
      'fold_consume' — the stride-2 2^3 Down entry consuming a folded
                       input as a 1^3 conv (emits unfolded);
      'fold_input'   — 3^3 conv on a RAW input fused with the output fold
                       (one 4^3 stride-2 conv, s2d.fold_conv) — the
                       in_block entry, avoiding the full-res fold
                       transpose.
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16
    mode: str = "normal"
    # the folded tensor this conv touches is in the W-PACKED rep
    # (s2d.fold_w on top of the fold — the 128-lane production format of
    # every 128^3-logical stage; see ops/s2d.py)
    wpack: bool = False

    @nn.compact
    def __call__(self, x, pre=None, want_stats: bool = False,
                 softmax_classes: int = 0):
        from vae_segmentation_tpu.ops import s2d

        pack = s2d.WPACK if self.wpack else 1
        mode = self.mode
        in_ch = x.shape[-1]
        if mode == "fold_input" and in_ch % (s2d.NB * pack) == 0:
            # Ingest-prefolded dispatch: the device ingest pipeline may hand
            # the entry conv the ALREADY-folded rep (cli/common._train_ingest
            # emits it so the fold reorg fuses into the augmentation gather
            # instead of running as a standalone copy at step entry). The
            # lane count is then a multiple of the pack; raw entry channel
            # counts (1-channel CT, n_class one-hots) sit far below it, so
            # divisibility decides the rep unambiguously.
            mode = "folded"
        if mode in ("folded", "fold_consume", "fold_bridge"):
            in_ch = in_ch // (s2d.NB * pack)  # params keep the UNfolded shape
        kshape = (*self.kernel, in_ch, self.features)
        fan_in = math.prod(self.kernel) * in_ch
        k = self.param("kernel", torch_uniform_init("conv"), kshape,
                       jnp.float32)
        b = self.param("bias", torch_bias_init(fan_in), (self.features,),
                       jnp.float32)
        xd = x.astype(self.dtype)
        if pre is not None:
            assert mode in ("normal", "folded", "fold_bridge"), mode
        # want_stats: ALSO return the output's [B, 2, Cout] f32 (sum,
        # sumsq) — (y, stats) with stats None when the taken path can't
        # provide them (XLA conv, spatial mesh). Kernel-emitted stats save
        # the following instance norm its full re-read of the activation.
        want = want_stats and stencil_stats_ok()

        def ret(y, st=None):
            return (y, st) if want_stats else y

        def unpack(out):
            return ret(*out) if want else ret(out)

        def pre_xla(xd):
            # pre given but the stencil path not taken: apply the norm
            # affine + relu as the plain XLA elementwise it fuses anyway
            if pre is None:
                return xd
            s_, t_ = pre
            return jnp.maximum(
                xd * s_[:, None, None, None, :].astype(self.dtype)
                + t_[:, None, None, None, :].astype(self.dtype),
                jnp.zeros((), self.dtype))

        if mode == "normal":
            if use_stencil() and tuple(self.kernel) == (3, 3, 3) \
                    and tuple(self.strides) == (1, 1, 1) \
                    and self.padding == "SAME" and in_ch >= 32 \
                    and xd.shape[3] >= 16 and xd.shape[3] % 8 == 0:
                from vae_segmentation_tpu.ops.pallas.stencil3 import (
                    conv3_stencil, conv3_stencil_pre)

                if pre is not None:
                    out = stencil_shard_wrap_pre(
                        lambda x_, s_, t_, k_, b_, dlim=None:
                        conv3_stencil_pre(x_, s_, t_, k_, b_, dlim, want),
                        stats=want)(
                        xd, pre[0], pre[1], k.astype(self.dtype), b)
                else:
                    out = stencil_shard_wrap(
                        lambda x_, k_, b_:
                        conv3_stencil(x_, k_, b_, False, want),
                        stats=want)(xd, k.astype(self.dtype), b)
                return unpack(out)
            y = jax.lax.conv_general_dilated(
                pre_xla(xd), k.astype(self.dtype), tuple(self.strides),
                self.padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        elif mode == "folded":
            ke = s2d.expand_kernel3_fast(k)
            if self.wpack:
                ke = s2d.expand_kernel_w(ke)
            bias_f = jnp.tile(b, s2d.NB * pack)
            if use_stencil() and xd.shape[3] % 8 == 0:
                # grouped-tap path: exploits the fold structure to merge
                # the 27 tap-GEMMs into 8 (exact; stencil3.py). Taken for
                # EVERY folded conv since round 4 — the old >=128-lane gate
                # left the lane-starved folded convs (the 32-lane VAE entry
                # on pred, the 16-lane prefolded image entry) on the 27-tap
                # path, whose dx kernel alone cost 2.7 ms/step at b4 128^3
                # (round-4 trace).
                from vae_segmentation_tpu.ops.pallas.stencil3 import (
                    conv3_stencil_folded, conv3_stencil_folded_pre)

                wp = self.wpack
                if softmax_classes and not want:
                    # fused head: conv + bias + class-group softmax in
                    # the kernel epilogue (no logits/exp HBM round trip);
                    # with pre, the decoder chain's final norm+relu rides
                    # in as the kernel prologue too
                    from vae_segmentation_tpu.ops.pallas.stencil3 import (
                        conv3_stencil_folded_softmax,
                        conv3_stencil_folded_softmax_pre)

                    nc = softmax_classes
                    if pre is not None:
                        out = stencil_shard_wrap_pre(
                            lambda x_, s_, t_, k_, b_, dlim=None:
                            conv3_stencil_folded_softmax_pre(
                                x_, s_, t_, k_, b_, wp, dlim, nc))(
                            xd, pre[0], pre[1], ke.astype(self.dtype),
                            bias_f)
                    else:
                        out = stencil_shard_wrap(
                            lambda x_, k_, b_:
                            conv3_stencil_folded_softmax(x_, k_, b_, wp,
                                                         nc))(
                            xd, ke.astype(self.dtype), bias_f)
                    return ret(out)
                if pre is not None:
                    out = stencil_shard_wrap_pre(
                        lambda x_, s_, t_, k_, b_, dlim=None:
                        conv3_stencil_folded_pre(x_, s_, t_, k_, b_, wp,
                                                 dlim, want),
                        stats=want)(
                        xd, pre[0], pre[1], ke.astype(self.dtype),
                        bias_f)
                else:
                    out = stencil_shard_wrap(
                        lambda x_, k_, b_:
                        conv3_stencil_folded(x_, k_, b_, wp, False,
                                             want),
                        stats=want)(xd, ke.astype(self.dtype), bias_f)
                return unpack(out)
            y = jax.lax.conv_general_dilated(
                pre_xla(xd), ke.astype(self.dtype), (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return ret(y + bias_f.astype(self.dtype))
        elif mode == "fold_bridge":
            # folded fine in -> folded coarse out, ONE stride-2 conv
            # (s2d.expand_down_fold_kernel): no unfold/fold reorg
            if self.wpack and use_stencil():
                # Pallas bridge — XLA lowers the block-sparse stride-2
                # conv in a channel-minor layout and pays copy fixups
                # around the stencil consumers (ops/pallas/upbridge.py)
                from vae_segmentation_tpu.ops.pallas.upbridge import (
                    down_bridge_w, down_bridge_w_pre)

                if pre is not None:
                    # the producing stage's final norm+relu rides in as
                    # the bridge prologue (no materialized normalize pass)
                    return ret(bridge_shard_wrap_pre(down_bridge_w_pre)(
                        xd, pre[0], pre[1], k.astype(self.dtype), b))
                return ret(bridge_shard_wrap(down_bridge_w)(
                    xd, k.astype(self.dtype), b))
            if pre is not None:  # XLA fallback: apply the affine first
                xd = jnp.maximum(
                    xd * pre[0].astype(self.dtype)[:, None, None, None, :]
                    + pre[1].astype(self.dtype)[:, None, None, None, :],
                    0.0)
            kd = s2d.expand_down_fold_kernel_w(k) if self.wpack \
                else s2d.expand_down_fold_kernel(k)
            y = jax.lax.conv_general_dilated(
                xd, kd.astype(self.dtype),
                (2, 2, 1) if self.wpack else (2, 2, 2), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return ret(y + jnp.tile(b, s2d.NB).astype(self.dtype))
        elif mode == "fold_consume":
            kd = s2d.expand_down_kernel_w(k) if self.wpack \
                else s2d.expand_down_kernel(k)
            y = jax.lax.conv_general_dilated(
                xd, kd.astype(self.dtype), (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            # wpack: output is the W-PAIRED coarse tensor (two coarse voxels
            # per position in channels); the Down module un-pairs it.
            return ret(y + jnp.tile(b, pack).astype(self.dtype))
        elif mode == "fold_input":
            if use_stencil() and (xd.shape[3] // (2 * pack)) % 8 == 0:
                # fold the RAW input first (a cheap reorg of the 1-channel
                # volume) and run the entry conv as a folded stencil conv —
                # XLA emits the fused 4^3-stride-2 fold_conv at ~1 TFLOP/s
                # (9 ms/call at 128^3 b4, round-2 trace)
                from vae_segmentation_tpu.ops.pallas.stencil3 import \
                    conv3_stencil

                xf = s2d.fold_rep(xd, self.wpack)
                ke = s2d.expand_kernel3_fast(k)
                if self.wpack:
                    ke = s2d.expand_kernel_w(ke)
                out = stencil_shard_wrap(
                    lambda x_, k_, b_:
                    conv3_stencil(x_, k_, b_, False, want),
                    stats=want)(
                    xf, ke.astype(self.dtype), jnp.tile(b, s2d.NB * pack))
                return unpack(out)
            y = s2d.fold_conv(xd, k, dtype=self.dtype)
            if self.wpack:
                y = s2d.fold_w(y)
            return ret(y + jnp.tile(b, s2d.NB * pack).astype(self.dtype))
        else:
            raise ValueError(mode)
        return ret(y + b.astype(self.dtype))


class TConv2(nn.Module):
    """2^3 stride-2 ConvTranspose (channel-preserving Up entry,
    joint_model.py:114-124) with torch-style init and an optional
    fold-emitting mode (1^3 conv producing the folded high-res rep)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    fold_emit: bool = False
    wpack: bool = False  # fold_emit target rep is W-PACKED (s2d.fold_w)
    fold_consume: bool = False  # input is the FOLDED coarse rep (bridge)

    @nn.compact
    def __call__(self, x):
        from vae_segmentation_tpu.ops import s2d

        in_ch = x.shape[-1]
        if self.fold_consume:
            in_ch //= s2d.NB  # params keep the UNfolded shape
        k = self.param("kernel", torch_uniform_init("transpose"),
                       (2, 2, 2, in_ch, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(8 * in_ch),
                       (self.features,), jnp.float32)
        xd = x.astype(self.dtype)
        if self.fold_consume:
            # folded coarse in -> folded fine out, ONE stride-2 transpose
            # conv (s2d.expand_up_fold_kernel): no unfold at the Up boundary
            assert self.fold_emit
            if self.wpack and use_stencil():
                # Pallas bridge: XLA's transpose-conv lowering emits a
                # channel-minor layout and pays full-volume copy fixups to
                # feed the standard-layout stencil consumers
                # (ops/pallas/upbridge.py)
                from vae_segmentation_tpu.ops.pallas.upbridge import \
                    up_bridge_w

                k1 = s2d.expand_up_kernel(k).reshape(in_ch,
                                                     s2d.NB * self.features)
                return bridge_shard_wrap(up_bridge_w)(
                    xd, k1.astype(self.dtype),
                    jnp.tile(b, s2d.NB * s2d.WPACK))
            ku = s2d.expand_up_fold_kernel_w(k) if self.wpack \
                else s2d.expand_up_fold_kernel(k)
            y = jax.lax.conv_transpose(
                xd, ku.astype(self.dtype),
                strides=(2, 2, 1) if self.wpack else (2, 2, 2),
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            pack = s2d.NB * (s2d.WPACK if self.wpack else 1)
            return y + jnp.tile(b.astype(self.dtype), pack)
        if self.fold_emit and self.wpack:
            y = jax.lax.conv_general_dilated(
                xd, s2d.expand_up_kernel_w(k).astype(self.dtype),
                (1, 1, s2d.WPACK), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y + jnp.tile(b.astype(self.dtype), s2d.NB * s2d.WPACK)
        if self.fold_emit:
            y = jax.lax.conv_general_dilated(
                xd, s2d.expand_up_kernel(k).astype(self.dtype),
                (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return y + jnp.tile(b.astype(self.dtype), s2d.NB)
        y = jax.lax.conv_transpose(
            xd, k.astype(self.dtype), strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + b.astype(self.dtype)


class ConvNormAct(nn.Module):
    """conv3^3 + norm + activation (reference `Conv`, joint_model.py:101-112).

    folded=True: input AND output are space-to-depth reps (ops/s2d.py)."""

    features: int
    norm_type: int = 1
    soft: bool = False
    dtype: Dtype = jnp.bfloat16
    folded: bool = False
    fold_input: bool = False  # raw input, fused fold (s2d.fold_conv)
    wpack: bool = False
    # return (conv_out, (scale, shift)) with the norm+relu UNapplied — the
    # consumer (the Down bridge prologue) applies it; the normalized
    # tensor never materializes. norm_type 1, not soft, only.
    defer_affine: bool = False

    @nn.compact
    def __call__(self, x):
        from vae_segmentation_tpu.ops import s2d

        defer_affine = self.defer_affine
        mode = "fold_input" if self.fold_input else (
            "folded" if self.folded else "normal")
        conv = Conv3(self.features, dtype=self.dtype, mode=mode,
                     wpack=self.wpack)
        if self.norm_type == 1:
            x, st = conv(x, want_stats=True)
            if st is not None:
                # instance-norm affine from the kernel-emitted stats: no
                # reduce pass over the conv output
                scale, shift = affine_from_stats(
                    st, math.prod(x.shape[1:4]), self.features)
            elif defer_affine:
                scale, shift = (
                    s2d.instance_norm_folded_affine(x, self.features)
                    if (self.folded or self.fold_input)
                    else instance_norm_affine(x))
            else:
                scale = None
            if defer_affine:
                # norm+relu to be applied by the CONSUMER (the Down
                # bridge prologue) — the normalized tensor never
                # materializes. Only valid for norm_type 1 without soft.
                assert not self.soft
                return x, (scale, shift)
            if st is not None:
                return _act(self.soft)(
                    x * scale.astype(x.dtype)[:, None, None, None, :]
                    + shift.astype(x.dtype)[:, None, None, None, :])
        else:
            assert not defer_affine
            x = conv(x)
        fc = self.features if (self.folded or self.fold_input) else 0
        return _norm_act(x, self.norm_type, self.soft, folded_c=fc)


class DoubleConv(nn.Module):
    """3x (conv3^3 + norm + act) (joint_model.py:35-52; despite the name it is
    a triple conv in the reference)."""

    features: int
    norm_type: int = 1
    soft: bool = False
    dtype: Dtype = jnp.bfloat16
    folded: bool = False
    wpack: bool = False
    # return (x, (scale, shift)) with the chain-FINAL norm+relu UNapplied —
    # the consumer (a bridge/head conv prologue) applies it and the
    # normalized stage-boundary tensor never materializes. norm_type 1,
    # not soft, only (see ConvNormAct.defer_affine).
    defer_affine: bool = False

    @nn.compact
    def __call__(self, x):
        from vae_segmentation_tpu.ops import s2d

        mode = "folded" if self.folded else "normal"
        # Intra-chain norm+relu rides into the NEXT conv as a fused
        # in-kernel prologue (the conv+norm+activation north star): between
        # two stencil convs only the tiny [B, C] norm affine is computed —
        # and with the stats epilogue even that affine comes from the
        # producer kernel's (sum, sumsq) outputs, so the full-resolution
        # activation is written once and never re-read for statistics.
        # The chain's FINAL norm+act stays materialized (its consumer is
        # the stage boundary, not a stencil conv) but its affine uses the
        # kernel stats too.
        fusable = (self.norm_type == 1 and not self.soft
                   and use_fused_prologue())
        affinable = self.norm_type == 1
        pre = None
        for i in range(3):
            conv = Conv3(self.features, dtype=self.dtype, mode=mode,
                         wpack=self.wpack)
            if affinable:
                x, st = conv(x, pre=pre, want_stats=True)
            else:
                x, st = conv(x, pre=pre), None
            pre = None
            n_spatial = math.prod(x.shape[1:4])
            defer = i == 2 and self.defer_affine and affinable \
                and not self.soft
            if (i < 2 and fusable and stencil_takes(x.shape, mode)) \
                    or defer:
                pre = affine_from_stats(st, n_spatial, self.features) \
                    if st is not None else (
                    s2d.instance_norm_folded_affine(x, self.features)
                    if self.folded else instance_norm_affine(x))
                if defer:
                    # chain-final norm+relu handed to the CONSUMER (a
                    # bridge/head conv prologue); the normalized tensor
                    # never materializes
                    return x, pre
            elif st is not None:
                scale, shift = affine_from_stats(st, n_spatial,
                                                 self.features)
                x = _act(self.soft)(
                    x * scale.astype(x.dtype)[:, None, None, None, :]
                    + shift.astype(x.dtype)[:, None, None, None, :])
            else:
                x = _norm_act(x, self.norm_type, self.soft,
                              folded_c=self.features if self.folded else 0)
        return x


class Down(nn.Module):
    """Channel-preserving strided 2^3 conv then DoubleConv(in->out)
    (joint_model.py:126-136).

    folded_in: the strided conv consumes a space-to-depth rep (1^3 conv)
    and emits the coarser resolution unfolded — the natural fold boundary.
    folded_out: refold the coarser resolution and run the DoubleConv in
    s2d space too (used while channel counts are still lane-starved)."""

    features: int
    norm_type: int = 1
    soft: bool = False
    dtype: Dtype = jnp.bfloat16
    folded_in: bool = False
    folded_out: bool = False
    wpack_in: bool = False  # the folded input is W-PACKED (s2d.fold_w)

    @nn.compact
    def __call__(self, x, pre=None):
        from vae_segmentation_tpu.ops import s2d

        pack = s2d.NB * (s2d.WPACK if self.wpack_in else 1)
        in_ch = x.shape[-1] // (pack if self.folded_in else 1)
        assert pre is None or (self.folded_in and self.folded_out)
        if self.folded_in and self.folded_out:
            # folded -> folded: one stride-2 conv in folded space, no
            # unfold/fold transposes at the boundary (s2d fold_bridge);
            # pre: the producer's deferred norm+relu affine rides in as
            # the bridge prologue
            x = Conv3(in_ch, kernel=(2, 2, 2), strides=(2, 2, 2),
                      padding="VALID", dtype=self.dtype,
                      mode="fold_bridge", wpack=self.wpack_in)(x, pre=pre)
        else:
            x = Conv3(in_ch, kernel=(2, 2, 2), strides=(2, 2, 2),
                      padding="VALID", dtype=self.dtype,
                      mode="fold_consume" if self.folded_in else "normal",
                      wpack=self.wpack_in)(x)
            if self.wpack_in:
                x = s2d.unfold_w(x)  # W-PAIRED coarse -> plain coarse
            if self.folded_out:
                x = s2d.fold(x)
        return DoubleConv(self.features, self.norm_type, self.soft,
                          dtype=self.dtype, folded=self.folded_out)(x)


class Up(nn.Module):
    """Channel-preserving ConvTranspose 2^3 stride 2 then DoubleConv(in->out)
    (joint_model.py:114-124).

    folded_in: the incoming coarse tensor is a space-to-depth rep — unfold
    first (the transpose conv wants the true resolution). folded_out: the
    transpose conv emits the fine resolution as a folded rep (1^3 conv)
    and the DoubleConv runs in s2d space."""

    features: int
    norm_type: int = 1
    soft: bool = False
    dtype: Dtype = jnp.bfloat16
    folded_in: bool = False
    folded_out: bool = False
    wpack_out: bool = False  # the folded output rep is W-PACKED
    # hand the stage-final norm+relu to the consumer as an unapplied
    # (scale, shift): __call__ returns (x, aff) — DoubleConv.defer_affine
    defer_affine: bool = False

    @nn.compact
    def __call__(self, x):
        from vae_segmentation_tpu.ops import s2d

        # folded -> folded: one stride-2 transpose conv in folded space
        # (s2d expand_up_fold_kernel), no unfold at the boundary
        bridge = self.folded_in and self.folded_out
        if self.folded_in and not bridge:
            x = s2d.unfold(x)
        in_ch = x.shape[-1] // (s2d.NB if bridge else 1)
        x = TConv2(in_ch, dtype=self.dtype, fold_emit=self.folded_out,
                   wpack=self.wpack_out, fold_consume=bridge)(x)
        return DoubleConv(self.features, self.norm_type, self.soft,
                          dtype=self.dtype, folded=self.folded_out,
                          wpack=self.wpack_out,
                          defer_affine=self.defer_affine)(x)


def remat_stage(cls, enabled: bool = True):
    """jax.checkpoint at the stage level (Down/Up/ConvNormAct): the 3-conv
    DoubleConv chain holds 3 conv outputs + 3 norm outputs per stage alive
    for the backward pass; remat keeps only the stage boundary activations
    and recomputes the rest. At 128^3 batch 4 this is the difference between
    16.2 GB (HBM OOM on v5e) and fitting — worth the ~1/3 extra stage FLOPs
    on an MXU-underutilized trunk. Transparent to the param tree."""
    return nn.remat(cls) if enabled else cls


class OutConv(nn.Module):
    """Plain 3^3 conv head (no norm/act), fp32 output for the softmax
    (joint_model.py:224,366). folded: s2d in AND out.

    softmax_classes (call arg): return class-group softmax PROBABILITIES
    (in the compute dtype) instead of fp32 logits — on the folded stencil
    path the softmax fuses into the conv kernel's epilogue
    (ops/pallas/stencil3.py::conv3_stencil_folded_softmax; no logits or
    f32 exp HBM round trip), elsewhere it falls back to the plain
    softmax. Callers keep the separate-softmax path when the reference's
    head dropout sits between conv and softmax (joint_model.py:386-387)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    folded: bool = False
    wpack: bool = False

    @nn.compact
    def __call__(self, x, softmax_classes: int = 0, pre=None):
        from vae_segmentation_tpu.ops import s2d

        fused = bool(softmax_classes) and self.folded and use_stencil() \
            and x.shape[3] % 8 == 0
        y = Conv3(self.features, dtype=self.dtype,
                  mode="folded" if self.folded else "normal",
                  wpack=self.wpack)(
                      x, pre=pre,
                      softmax_classes=softmax_classes if fused else 0)
        if not softmax_classes:
            return y.astype(jnp.float32)
        if fused:
            return y  # probabilities, compute dtype
        if self.folded:
            return s2d.softmax_folded(y.astype(jnp.float32),
                                      softmax_classes).astype(self.dtype)
        return jax.nn.softmax(y.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
