"""Root-cause the GT dispatch wall (VERDICT r3 item 3): the brute-force
k-NN sweep has measured ~0.5 TFLOP/s effective (approx_min_k) / ~2.3 TFLOP/s
(block selection) across rounds — 1-2% of the v5e MXU roof — invariant to
matmul precision and tile size. This probe decomposes ONE ``knn_device``
dispatch at the 10M-shard GT shape into its parts, each as a separately
jitted+timed program on identical device-resident data:

  rtt        tiny x+1 program               -> relay round-trip floor
  matmul     scan of Q@tile.T, write [q,1]  -> MXU + scores-write roof
  blockmin   + contiguous [q,nblk,S] min/argmin reduction (current code)
  blockmin_s + strided [q,S,nblk] lane-aligned variant
  full       knn_device approx="block"      -> adds top_k merge + scan carry
  full_amk   knn_device approx=True         -> approx_min_k selection

Per-leg effective TFLOP/s = Q*N*D*2 / wall. The gap between legs names the
cost. Run ONLY while no other TPU process is active (single tunnel).

Usage: python scripts/probe_gt_profile.py [Q] [N] [reps]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.ops.topk import knn_device  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_250_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
D = 200
TILE = 16384
K = 100
S = 64

rng = np.random.default_rng(0)
base = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
qs = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
flops = Q * N * D * 2


def timeit(name, fn, *args):
    np.asarray(fn(*args))  # compile + warm
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        np.asarray(fn(*args))
        walls.append(time.time() - t0)
    w = min(walls)
    print(f"{name:12s} {w:8.3f}s  {flops / w / 1e12:7.2f} TF/s  "
          f"(all: {['%.2f' % x for x in walls]})", flush=True)
    return w


# --- RTT floor ----------------------------------------------------------
tiny = jnp.ones((8, 128))
rtt = timeit("rtt", jax.jit(lambda x: x + 1.0), tiny)

num_tiles = N // TILE
ntrim = num_tiles * TILE


def _scan(body):
    def run(q, b):
        def step(carry, off):
            tile_vecs = jax.lax.dynamic_slice_in_dim(b, off, TILE)
            return body(carry, q, tile_vecs, off), None

        offs = jnp.arange(num_tiles, dtype=jnp.int32) * TILE
        init = (jnp.full((Q, K), jnp.inf, jnp.float32),
                jnp.full((Q, K), jnp.int32(2**31 - 1), jnp.int32))
        (d, i), _ = jax.lax.scan(step, init, offs)
        return d, i

    return jax.jit(run)


def body_matmul(carry, q, tile_vecs, off):
    # scores + a [q, K]-shaped reduction so XLA can't elide the matmul;
    # no selection machinery
    s = -(q @ tile_vecs.T)
    d, i = carry
    return jnp.minimum(d, jax.lax.dynamic_slice_in_dim(s, 0, K, axis=1)), i


def body_blockmin(carry, q, tile_vecs, off):
    # current contiguous-block formulation (topk.py approx="block") minus
    # the top_k merge: min/argmin over [q, nblk, S]
    s = -(q @ tile_vecs.T)
    nblk = TILE // S
    sb = s.reshape(Q, nblk, S)
    bd = jnp.min(sb, axis=2)
    bi = jnp.argmin(sb, axis=2).astype(jnp.int32)
    d, i = carry
    return (jnp.minimum(d, jax.lax.dynamic_slice_in_dim(bd, 0, K, axis=1)),
            jnp.minimum(i, jax.lax.dynamic_slice_in_dim(bi, 0, K, axis=1)))


def body_blockmin_strided(carry, q, tile_vecs, off):
    # strided blocks: reduce over the SUBLANE axis of [q, S, nblk] — block j
    # holds scores j, j+nblk, j+2*nblk, ... (lane-aligned minor dim)
    s = -(q @ tile_vecs.T)
    nblk = TILE // S
    sb = s.reshape(Q, S, nblk)
    bd = jnp.min(sb, axis=1)
    bi = jnp.argmin(sb, axis=1).astype(jnp.int32)
    d, i = carry
    return (jnp.minimum(d, jax.lax.dynamic_slice_in_dim(bd, 0, K, axis=1)),
            jnp.minimum(i, jax.lax.dynamic_slice_in_dim(bi, 0, K, axis=1)))


def body_blockmin_topk(carry, q, tile_vecs, off):
    # block-min + the running top-k merge = the full current pipeline,
    # expressed inline (sanity check vs knn_device timing)
    from roargraph_tpu.ops.topk import _merge_topk
    s = -(q @ tile_vecs.T)
    nblk = TILE // S
    sb = s.reshape(Q, nblk, S)
    bd = jnp.min(sb, axis=2)
    bi = jnp.argmin(sb, axis=2).astype(jnp.int32)
    blk_ids = (off + S * jax.lax.broadcasted_iota(jnp.int32, (Q, nblk), 1)
               ) + bi
    neg, pos = jax.lax.top_k(-bd, K)
    ci = jnp.take_along_axis(blk_ids, pos, axis=1)
    d, i = carry
    return _merge_topk(d, i, -neg, ci, K)


bt = base[:ntrim]
timeit("matmul", _scan(body_matmul), qs, bt)
timeit("blockmin", _scan(body_blockmin), qs, bt)
timeit("blockmin_s", _scan(body_blockmin_strided), qs, bt)
timeit("bm+topk", _scan(body_blockmin_topk), qs, bt)


def full(mode, prec):
    def run():
        ids, _ = knn_device(qs, base, k=K, metric="ip", tile=TILE,
                            query_batch=8192, approx=mode,
                            precision=prec, return_dists=False)
        return ids

    return run


timeit("full_block", full("block", jax.lax.Precision.DEFAULT))
timeit("full_blk_hi", full("block", jax.lax.Precision.HIGHEST))
timeit("full_amk", full(True, jax.lax.Precision.DEFAULT))
print(f"roofline note: matmul leg includes the [Q,{TILE}] f32 scores "
      f"write each tile; HBM-only floor at 819 GB/s = "
      f"{num_tiles * (Q * TILE * 4) / 819e9:.3f}s", flush=True)
