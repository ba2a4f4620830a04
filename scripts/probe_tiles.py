"""Probe: tile-engine recall/QPS at bench scale on the real device.

Usage: python scripts/probe_tiles.py [N] [C] [Mc]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.ops.topk import knn  # noqa: E402
from roargraph_tpu.tiles import build_tiles, tile_search, upload  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
C = int(sys.argv[2]) if len(sys.argv) > 2 else 512
Mc = int(sys.argv[3]) if len(sys.argv) > 3 else 32
FILL = float(os.environ.get("PROBE_FILL", 0.75))
BATCH = int(os.environ.get("PROBE_BATCH", 8192))
MODES = os.environ.get("PROBE_MODES", "graph").split(",")
T_VALUES = [int(t) for t in os.environ.get(
    "PROBE_T", "2,4,6,8,12,16,24,32,48").split(",")]
N_TRAIN, N_EVAL, D, SEED, K = 50_000, 8_192, 200, 0, 10

base, train_q, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
cache = os.path.join("build", f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
graph = rt.PaddedGraph.load_npz(cache)
print(f"graph loaded: {graph.ids.shape}", file=sys.stderr)

tile_cache = cache.replace(".npz", f"_tiles_{C}_{Mc}_{FILL}.npz")
from roargraph_tpu.tiles import TileIndex
if os.path.exists(tile_cache):
    tidx = TileIndex.load_npz(tile_cache)
else:
    t0 = time.time()
    tidx = build_tiles(graph, base, cluster_size=C, Mc=Mc, metric="ip",
                       fill=FILL)
    print(f"tile build: {time.time()-t0:.1f}s K={tidx.num_clusters}",
          file=sys.stderr)
    tidx.save_npz(tile_cache)
DTYPE = os.environ.get("PROBE_DTYPE", "float32")
if DTYPE != "float32":
    import jax.numpy as jnp
    tidx = tidx.astype(jnp.bfloat16)
print(f"K={tidx.num_clusters} C={tidx.cluster_size} batch={BATCH} "
      f"dtype={DTYPE}", file=sys.stderr)

gt_ids, _ = knn(eval_q, base, k=K, metric="ip")

dev = upload(tidx)
import jax.numpy as _jnp
eval_q = _jnp.asarray(eval_q)  # one upload shared by every sweep point


def rec(ids):
    return np.mean([len(set(ids[i, :K].tolist()) &
                        set(gt_ids[i, :K].tolist())) / K
                    for i in range(ids.shape[0])])


for name in MODES:
    mode = name == "graph"
    print(f"-- mode={name}", file=sys.stderr)
    print("T\tQPS(post-warm)\tQPS(min)\trecall\tcmps", file=sys.stderr)
    for T in T_VALUES:
        times = []
        for it in range(3):
            t0 = time.perf_counter()
            ids, d, cmps, hops = tile_search(
                tidx, eval_q, k=K, T=T, Lc=max(2 * T, 16), metric="ip",
                use_graph=mode, batch_size=BATCH, device_arrays=dev)
            times.append(time.perf_counter() - t0)
        r = rec(ids)
        qps_post = N_EVAL / times[1]
        qps_min = N_EVAL / min(times[1:])
        print(f"{T}\t{qps_post:.0f}\t{qps_min:.0f}\t{r:.4f}\t"
              f"{float(np.mean(cmps)):.0f}", file=sys.stderr, flush=True)
