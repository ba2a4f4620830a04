"""Extend the tile-engine T sweep at large N from the bench caches.

Usage: python scripts/probe_tiles_1m.py [N] [T values...]
Env: PROBE_LC_MULT (Lc = mult*T, default 2), PROBE_BATCH.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu import eval as reval  # noqa: E402
from roargraph_tpu.ops.topk import knn  # noqa: E402
from roargraph_tpu.tiles import TileIndex, tile_search, upload  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
T_VALUES = [int(x) for x in sys.argv[2:]] or [64, 96, 128, 192, 256]
LC_MULT = int(os.environ.get("PROBE_LC_MULT", 2))
BATCH = int(os.environ.get("PROBE_BATCH", 8192))
N_TRAIN, N_EVAL, D, SEED, K = N // 2, 8_192, 200, 0, 10

base, _, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
cache = os.path.join("build", f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
tidx = TileIndex.load_npz(cache.replace(".npz", "_tiles256.npz"))
tidx = tidx.astype(jnp.bfloat16)
dev = upload(tidx)
eval_q = jnp.asarray(eval_q)
gt_ids, _ = knn(eval_q, np.asarray(base), k=K, metric="ip")
print(f"K={tidx.num_clusters} C={tidx.cluster_size} Lc={LC_MULT}*T",
      file=sys.stderr)


def fn(T):
    return tile_search(tidx, eval_q, k=K, T=T, Lc=LC_MULT * T, metric="ip",
                       batch_size=BATCH, device_arrays=dev)


rows = reval.sweep(fn, T_VALUES, np.asarray(gt_ids), k=K,
                   metric=rt.Metric.IP, n_queries=N_EVAL, verbose=True,
                   raw=True)
best = reval.qps_at_recall(rows, 0.95)
print(f"# qps@0.95={best}", file=sys.stderr)
