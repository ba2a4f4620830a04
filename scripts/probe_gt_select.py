"""A/B the shard-GT per-tile candidate selection on the real 10M data:
``lax.approx_min_k`` (PartialReduce) vs the block-min reduce (topk.py
``approx="block"``). The GT sweep executes at ~0.5 TFLOP/s effective across
rounds — far below both the MXU and HBM roofs — and the matmul
precision/tile experiments moved nothing, leaving the per-tile selection as
the prime suspect. Run ONLY while the 10M chain is stopped (single TPU).

Usage: python scripts/probe_gt_select.py [n_queries_per_side]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.ops.topk import knn_device  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

Q = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
D = 200
TILE = int(os.environ.get("B10M_GT_TILE", 16384))

base = np.load("build/t2i10m_base.npy", mmap_mode="r")
train = np.load("build/t2i10m_train.npy", mmap_mode="r")
shard = jnp.asarray(base[1_250_000: 2_500_000])
qs = jnp.asarray(np.ascontiguousarray(train[:Q]))
print(f"shard {shard.shape} queries {qs.shape} tile {TILE}", flush=True)

results = {}
for mode in ("block", True):
    ids, _ = knn_device(qs, shard, k=100, metric="ip", tile=TILE,
                        query_batch=8192, approx=mode, return_dists=False)
    np.asarray(ids)  # force warm compile + first run
    t0 = time.time()
    ids, _ = knn_device(qs, shard, k=100, metric="ip", tile=TILE,
                        query_batch=8192, approx=mode, return_dists=False)
    ids = np.asarray(ids)
    dt = time.time() - t0
    results[str(mode)] = (dt, ids)
    print(f"approx={mode}: {dt:.1f}s for {Q} queries "
          f"({Q / dt:.0f} q/s)", flush=True)

a, b = results["True"][1], results["block"][1]
ov = np.mean([len(set(a[i].tolist()) & set(b[i].tolist())) / 100
              for i in range(min(Q, 2048))])
print(f"id overlap block vs approx_min_k: {ov:.4f}", flush=True)
