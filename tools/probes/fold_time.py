"""Micro-probe: implementations of the full-res 1-channel fold
(s2d.fold(_w) of the image / label volumes — 2.7 ms/step of XLA `copy`s in
the round-3 trace). Candidates:
  a) reshape/transpose (current: XLA copy)
  b) fold-as-conv: stride-(2,2,4) kernel-(2,2,4) identity conv 1 -> 16 ch
  c) fold-as-GEMM inside a Pallas kernel: per D-pair plane,
     out = S_eh @ x_plane @ P_(ed,eh) with 0/1 selection matrices
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from vae_segmentation_tpu.ops import s2d

B, S = 4, 128
x = jnp.asarray(np.random.default_rng(0).normal(size=(B, S, S, S)),
                jnp.bfloat16)


def wfold(v):  # current path: fold + fold_w reorg
    return s2d.fold_w(s2d.fold(v[..., None]))


def fold_conv(v):
    k = np.zeros((2, 2, 4, 1, 16), np.float32)
    for ed in range(2):
        for eh in range(2):
            for w4 in range(4):
                ew2, ew = divmod(w4, 2)
                k[ed, eh, w4, 0, ew2 * 8 + ed * 4 + eh * 2 + ew] = 1
    return jax.lax.conv_general_dilated(
        v[..., None], jnp.asarray(k, jnp.bfloat16), (2, 2, 4), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def bench(f, name):
    # NOTE: through the axon tunnel block_until_ready does not reliably
    # block; a host transfer of a slice is the sync point (bench.py note).
    g = jax.jit(f)
    r = g(x); np.asarray(r[0, 0, 0])
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        r = g(x)
    np.asarray(r[0, 0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:12s} {dt:7.3f} ms  out={r.shape}", flush=True)
    return r


want = bench(wfold, "reorg")
got = bench(fold_conv, "fold_conv")
np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
print("fold_conv exact")


def pallas_fold(v):
    from vae_segmentation_tpu.ops.pallas.fold import fold1
    return fold1(v, True)


got_p = bench(pallas_fold, "pallas_gemm")
np.testing.assert_array_equal(np.asarray(want), np.asarray(got_p))
print("pallas_gemm exact")
