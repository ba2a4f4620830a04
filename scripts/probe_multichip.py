"""Multi-chip search scaling on the virtual CPU mesh (VERDICT r1 #9).

For S in {2, 4, 8} shards over a fixed total base: build per-shard
RoarGraphs once, then measure the SPMD search step — wall time, recall,
per-device work balance (hops imbalance across shards) and the merge
overhead is implied by the flatness of per-query cost as S grows.

CPU timings are not TPU-representative in absolute terms; the point is the
scaling *shape* (per-device work ~ 1/S graph size, k-sized merge traffic).
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.dist import build_sharded, make_mesh, sharded_search  # noqa: E402
from roargraph_tpu.ops.topk import knn  # noqa: E402
from roargraph_tpu import eval as reval  # noqa: E402

N, Nq, Q, D = 24_000, 8_000, 2_048, 32
rng = np.random.default_rng(11)
base = rng.standard_normal((N, D)).astype(np.float32)
dirv = rng.standard_normal(D).astype(np.float32)
dirv /= np.linalg.norm(dirv)
train_q = (rng.standard_normal((Nq, D)) * 0.7 + 0.8 * dirv).astype(np.float32)
eval_q = (rng.standard_normal((Q, D)) * 0.7 + 0.8 * dirv).astype(np.float32)
gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
cfg = rt.BuildConfig(metric="ip", M_sq=32, M_pjbp=8, L_pjpq=48,
                     prune_batch=512, search_batch=512)
scfg = rt.SearchConfig(k=10, L_pq=48, metric="ip")

print("S\twall_s(post-warm)\tqps\trecall\thops_mean\thops_imbalance",
      flush=True)
for S in (2, 4, 8):
    cache = f"build/probe_mc_{N}_{S}.npz"
    if os.path.exists(cache):
        from roargraph_tpu.dist import ShardedRoarGraph
        index = ShardedRoarGraph.load_npz(cache)
    else:
        mesh_b = make_mesh(S, 1)
        index = build_sharded(base, None, cfg, n_shards=S,
                              train_queries=train_q, mesh=mesh_b)
        os.makedirs("build", exist_ok=True)
        index.save_npz(cache)
    mesh = make_mesh(S, 8 // S)
    for attempt in range(2):
        t0 = time.perf_counter()
        out = sharded_search(index, eval_q, scfg, mesh=mesh,
                             with_stats=True)
        dt = time.perf_counter() - t0
    ids, dists, cmps, hops = out
    rec = reval.recall_at_k(ids, gt_ids, 10)
    per_shard = hops.mean(axis=1)
    imb = float(per_shard.max() / max(per_shard.mean(), 1e-9))
    print(f"{S}\t{dt:.2f}\t{Q/dt:.0f}\t{rec:.4f}\t"
          f"{float(hops.mean()):.1f}\t{imb:.3f}", flush=True)
