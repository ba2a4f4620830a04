"""Bisect the tile-search hop: time each stage of tile_search_batch's hop
body in isolation at serving shapes (B=8192, the bench point).

Stages: grouped cluster scan, running-top-k merge, queue update (neighbor
merge + 2-key sort), visited ops, frontier pick.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from roargraph_tpu.config import Metric  # noqa: E402
from roargraph_tpu.graph import PAD  # noqa: E402
from roargraph_tpu.ops.distance import pairwise_scores  # noqa: E402
from roargraph_tpu.tiles import (TileIndex, _scan_clusters_grouped,
                                 upload)  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
C = 256
B = int(os.environ.get("PROBE_BATCH", 8192))
T = 12
K_TOP = 10
REPS = int(os.environ.get("PROBE_REPS", 20))
N_TRAIN, N_EVAL, D, SEED = N // 2 if N >= 10**6 else 50_000, 8192, 200, 0

base, _, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
cache = os.path.join("build", f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
tidx = TileIndex.load_npz(cache.replace(".npz", "_tiles256.npz"))
tidx = tidx.astype(jnp.bfloat16)
tiles_t, gids, cents, adj, norms = upload(tidx)[:5]
K, Dp, Cc = tiles_t.shape
Mc = tidx.adj.shape[1]
Lc = 24
rng = np.random.default_rng(0)
q = jnp.asarray(eval_q[:B] if B <= N_EVAL else
                np.tile(eval_q, (B // N_EVAL + 1, 1))[:B])
qp = jnp.pad(q, ((0, 0), (0, Dp - q.shape[1])))
f = jnp.asarray(rng.integers(0, K, B).astype(np.int32))
rk_d = jnp.asarray(rng.random((B, K_TOP)).astype(np.float32))
rk_i = jnp.asarray(rng.integers(0, N, (B, K_TOP)).astype(np.int32))
sc = jnp.asarray(rng.random((B, Cc)).astype(np.float32))
ids_b = jnp.asarray(rng.integers(0, N, (B, Cc)).astype(np.int32))
q_d = jnp.asarray(np.sort(rng.random((B, Lc)).astype(np.float32), axis=1))
q_i = jnp.asarray(rng.integers(0, K, (B, Lc)).astype(np.int32))
q_e = jnp.zeros((B, Lc), jnp.int32)
s_full = jnp.asarray(rng.random((B, K)).astype(np.float32))
Wc = (K + 31) // 32
visited = jnp.zeros((B, Wc), jnp.uint32)
b_arange = jnp.arange(B)


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0].astype(
        jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


scan = jax.jit(lambda ff, qq: _scan_clusters_grouped(tiles_t, ff, qq))
print(f"B={B} K={K} C={Cc} Mc={Mc} Lc={Lc}")
print(f"scan grouped:      {timeit(scan, f, qp):7.3f} ms")

gather_gids = jax.jit(lambda ff: gids[ff])
print(f"gids gather:       {timeit(gather_gids, f):7.3f} ms")


@jax.jit
def merge(rd, ri, s, ib):
    all_d = jnp.concatenate([rd, s], axis=1)
    all_i = jnp.concatenate([ri, ib], axis=1)
    neg, pos = jax.lax.top_k(-all_d, K_TOP)
    return -neg, jnp.take_along_axis(all_i, pos, axis=1)


print(f"topk merge [B,{K_TOP + Cc}]: {timeit(merge, rk_d, rk_i, sc, ids_b):7.3f} ms")


@jax.jit
def queue_update(qd, qi, qe, ff, vis):
    nbr = adj[ff]
    n_ok = nbr != PAD
    n_safe = jnp.clip(nbr, 0, K - 1)
    seen = (vis[b_arange[:, None], n_safe // 32] >>
            (n_safe % 32).astype(jnp.uint32)) & 1
    queued = jnp.any(qi[:, :, None] == n_safe[:, None, :], axis=1)
    n_ok = n_ok & (seen == 0) & ~queued
    n_d = jnp.where(n_ok, s_full[b_arange[:, None], n_safe], jnp.inf)
    n_i = jnp.where(n_ok, nbr, jnp.int32(2**31 - 1))
    all_qd = jnp.concatenate([qd, n_d], axis=1)
    all_qi = jnp.concatenate([qi, n_i], axis=1)
    all_qe = jnp.concatenate([qe, jnp.zeros_like(n_i)], axis=1)
    all_qd, all_qi, all_qe = jax.lax.sort(
        (all_qd, all_qi, all_qe), num_keys=2)
    return all_qd[:, :Lc], all_qi[:, :Lc], all_qe[:, :Lc]


print(f"queue update:      {timeit(queue_update, q_d, q_i, q_e, f, visited):7.3f} ms")


@jax.jit
def centroid_gather(ff):
    # the s_full[b, n_safe] gather inside queue_update, isolated
    nbr = adj[ff]
    n_safe = jnp.clip(nbr, 0, K - 1)
    return s_full[b_arange[:, None], n_safe]


print(f"  centroid gather: {timeit(centroid_gather, f):7.3f} ms")


@jax.jit
def visited_ops(vis, ff):
    w, bit = ff // 32, jnp.uint32(1) << (ff % 32).astype(jnp.uint32)
    return vis.at[b_arange, w].set(vis[b_arange, w] | bit)


print(f"visited set:       {timeit(visited_ops, visited, f):7.3f} ms")


@jax.jit
def frontier_pick(qd, qi, qe):
    unexp = (qe == 0) & (qi != 2**31 - 1)
    active = jnp.any(unexp, axis=1)
    jj = jnp.argmax(unexp, axis=1)
    ff = jnp.where(active, qi[b_arange, jj], 0)
    return ff, active


print(f"frontier pick:     {timeit(frontier_pick, q_d, q_i, q_e):7.3f} ms")
