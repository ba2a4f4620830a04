"""Measure the fused scan+select kernels at the serving operating point.

VERDICT r3 item 9: the tile hop floor is the grouped scan + running top-k
merge (~3 ms at B=8192 on the 100k index); the named lever is fusing
scan+merge in one Pallas kernel. This probe times one-pass tile search at
B=8192 across scan impls (each impl timed over the same T-hop walk, same
index, same queries) and reports ms/hop + QPS + recall, on either the
bench 100k/1M cache or a 10M-build shard graph.

Usage:
  python scripts/probe_fused_hop.py                 # 100k bench cache
  PROBE_SHARD=build/t2i10m_graph_shard0.npz \
  PROBE_BASE=build/t2i10m_base.npy PROBE_ROWS=0:1250000 \
  PROBE_TILES=build/t2i10m_tiles_shard0.npz \
      python scripts/probe_fused_hop.py             # 1.25M shard

Env: PROBE_T (default 48), PROBE_BATCH (8192), PROBE_IMPLS (csv),
PROBE_DTYPE (bfloat16).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.ops.topk import knn  # noqa: E402
from roargraph_tpu.tiles import (TileIndex, build_tiles, tile_search,  # noqa: E402
                                 upload)
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

T = int(os.environ.get("PROBE_T", 48))
BATCH = int(os.environ.get("PROBE_BATCH", 8192))
K = 10
IMPLS = os.environ.get(
    "PROBE_IMPLS",
    "grouped,pallas,grouped_pallas,grouped_pallas_fused,pallas_fused").split(",")
DTYPE = os.environ.get("PROBE_DTYPE", "bfloat16")

if os.environ.get("PROBE_SHARD"):
    graph = rt.PaddedGraph.load_npz(os.environ["PROBE_SHARD"])
    base = np.load(os.environ["PROBE_BASE"], mmap_mode="r")
    if os.environ.get("PROBE_ROWS"):
        lo, hi = (int(x) for x in os.environ["PROBE_ROWS"].split(":"))
        base = np.asarray(base[lo:hi])
    eval_q = np.asarray(np.load(
        os.environ.get("PROBE_EVAL", "build/t2i10m_eval.npy"),
        mmap_mode="r")[:BATCH])
    tpath = os.environ.get("PROBE_TILES", "")
    if tpath and os.path.exists(tpath):
        tidx = TileIndex.load_npz(tpath)
    else:
        t0 = time.time()
        tidx = build_tiles(graph, base, cluster_size=256, Mc=24, metric="ip")
        print(f"tile build: {time.time() - t0:.0f}s K={tidx.num_clusters}",
              file=sys.stderr, flush=True)
        if tpath:
            tidx.save_npz(tpath)
else:
    N = int(os.environ.get("PROBE_N", 100_000))
    N_TRAIN = int(os.environ.get("PROBE_TRAIN", N // 2))
    D, SEED = 200, 0
    base, _, eval_q = benchmod.make_data(N, N_TRAIN, 8192, D, SEED)
    eval_q = eval_q[:BATCH]
    cache = os.path.join("build", f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
    tidx = TileIndex.load_npz(cache.replace(".npz", "_tiles256.npz"))

if DTYPE != "float32":
    tidx = tidx.astype(jnp.bfloat16)
dev = upload(tidx)
eval_dev = jnp.asarray(eval_q)
gt_ids, _ = knn(eval_dev, np.asarray(base), k=K, metric="ip",
                query_batch=8192)
gt_ids = np.asarray(gt_ids)
print(f"K={tidx.num_clusters} C={tidx.cluster_size} T={T} B={BATCH} "
      f"dtype={DTYPE}", flush=True)


def recall(ids):
    return np.mean([len(set(ids[i, :K].tolist()) &
                        set(gt_ids[i, :K].tolist())) / K
                    for i in range(ids.shape[0])])


results = {}
for impl in IMPLS:
    for me in (1, 4):
        try:
            t0 = time.time()
            out = tile_search(tidx, eval_dev, k=K, T=T, Lc=2 * T,
                              metric="ip", batch_size=BATCH,
                              device_arrays=dev, scan_impl=impl,
                              merge_every=me)
            warm = time.time() - t0
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = tile_search(tidx, eval_dev, k=K, T=T, Lc=2 * T,
                                  metric="ip", batch_size=BATCH,
                                  device_arrays=dev, scan_impl=impl,
                                  merge_every=me)
                best = min(best, time.time() - t0)
            r = recall(out[0])
            qps = BATCH / best
            ms_hop = best / T * 1e3
            results[f"{impl}_m{me}"] = (ms_hop, qps, r)
            print(f"{impl:28s} merge_every={me}: {ms_hop:7.2f} ms/hop  "
                  f"{qps:9.0f} qps  recall {r:.4f}  (warm {warm:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe records failures
            print(f"{impl:28s} merge_every={me}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
