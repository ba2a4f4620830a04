"""Probe: where does a tile-search batch spend its time?

Breaks the serving path into device-timed stages (all on pre-uploaded
arrays, timed with block_until_ready around repeated calls so the tunnel
RTT amortizes):

  - e2e: full tile_search_batch dispatch
  - hops-only: the same with T=1 vs T (slope = per-hop cost, intercept =
    fixed overhead: centroid scores + init top-k + result copies)
  - rtt: a trivial 1-element add (pure round-trip)

Usage: python scripts/probe_serving.py [N] [C]; env PROBE_BATCH/PROBE_T.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.tiles import (TileIndex, build_tiles, tile_search_batch,
                                 upload)  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402
from roargraph_tpu.config import Metric  # noqa: E402

enable_compilation_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
BATCH = int(os.environ.get("PROBE_BATCH", 8192))
T = int(os.environ.get("PROBE_T", 12))
SCAN = os.environ.get("PROBE_SCAN", "grouped")
REPS = int(os.environ.get("PROBE_REPS", 10))
N_TRAIN = N // 2 if N >= 10**6 else 50_000  # matches the bench cache names
N_EVAL, D, SEED, K = 8_192, 200, 0, 10

base, _, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
cache = os.path.join("build", f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
graph = rt.PaddedGraph.load_npz(cache)
tile_cache = cache.replace(".npz", f"_tiles{C}.npz")
if os.path.exists(tile_cache):
    tidx = TileIndex.load_npz(tile_cache)
else:
    tidx = build_tiles(graph, base, cluster_size=C, Mc=32, metric="ip",
                       fill=0.7)
    tidx.save_npz(tile_cache)
tidx = tidx.astype(jnp.bfloat16)
dev = upload(tidx)
tiles_t, gids, cents, adj, norms = dev[:5]
q = jnp.asarray(eval_q[:BATCH])
if BATCH > eval_q.shape[0]:
    q = jnp.tile(jnp.asarray(eval_q), (BATCH // eval_q.shape[0] + 1, 1)
                 )[:BATCH]
print(f"K={tidx.num_clusters} C={tidx.cluster_size} B={BATCH} T={T} "
      f"scan={SCAN}", flush=True)


def _force(out):
    # the relay's block_until_ready does not actually wait; a scalar fetch
    # drains the dispatch queue (verify SKILL.md gotcha)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, reps=REPS):
    _force(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _force(out)
    return (time.perf_counter() - t0) / reps


one = jnp.ones((8, 128), jnp.float32)
rtt = timeit(lambda: (one + 1.0))
print(f"rtt/dispatch floor:      {rtt*1e3:8.3f} ms", flush=True)

for t_probe in (1, 2, T, 2 * T):
    dt = timeit(lambda tp=t_probe: tile_search_batch(
        tiles_t, gids, cents, adj, q, norms, k=K, T=tp,
        Lc=max(2 * T, 16), metric=Metric.IP, scan_impl=SCAN))
    print(f"e2e T={t_probe:<3d}            {dt*1e3:8.3f} ms   "
          f"({BATCH/dt:,.0f} qps pipelined)", flush=True)

# fixed-stage cost: centroid scoring + top-k only
from roargraph_tpu.ops.distance import pairwise_scores  # noqa: E402


@jax.jit
def _init_only(qq):
    s = pairwise_scores(qq, cents, Metric.IP)
    qd, qi = jax.lax.top_k(-s, max(2 * T, 16))
    return qd, qi


dt = timeit(lambda: _init_only(q))
print(f"init (centroid+topk):   {dt*1e3:8.3f} ms", flush=True)
