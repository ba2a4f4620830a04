"""Probe: per-batch phase-B cost breakdown at bench scale.

Times the capture search and the fused step separately for a few
(search_batch, expand, gather_chunk, visited_dense) combos over a handful of
batches — avoids guessing where the 100k connectivity time goes.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.build import (_phase_a, _phase_b_step,  # noqa: E402
                                 compute_medoid)
from roargraph_tpu.graph import PAD  # noqa: E402
from roargraph_tpu.search import beam_search_batch  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_TRAIN = int(os.environ.get("PROBE_TRAIN", N // 2))
D, SEED = 200, 0
L = 500
M = 35
W = 2 * M

base, train_q, _ = benchmod.make_data(N, N_TRAIN, 8192, D, SEED)
base_dev = jnp.asarray(base)
gt_cache = os.path.join("build", f"bench_gt_{N}_{N_TRAIN}_{D}_{SEED}.npz")
with np.load(gt_cache) as z:
    train_ids = z["ids"]

cfg = rt.BuildConfig(metric="ip", M_sq=100, M_pjbp=M, L_pjpq=L,
                     prune_batch=1024, search_batch=1024)
t0 = time.time()
adj_i, adj_d = _phase_a(base_dev, train_ids, cfg, N)
print(f"phase A (device core): {time.time()-t0:.1f}s", file=sys.stderr)
ep = compute_medoid(base_dev)

supply_i = np.full((N, W), PAD, np.int32)
supply_d = np.full((N, W), np.inf, np.float32)
supply_i[:, :M] = adj_i
supply_d[:, :M] = adj_d

combos = [
    dict(B=2048, E=1, chunk=32, dense=None),
    dict(B=2048, E=4, chunk=64, dense=None),
    dict(B=2048, E=4, chunk=0, dense=None),
    dict(B=2048, E=8, chunk=96, dense=None),
    dict(B=2048, E=8, chunk=0, dense=None),
]
n_batches = 4
for c in combos:
    B, E, chunk, dense = c["B"], c["E"], c["chunk"], c["dense"]
    si = jnp.asarray(supply_i)
    sd = jnp.asarray(supply_d)
    deg = jnp.asarray((supply_i != PAD).sum(axis=1).astype(np.int32))
    pidev = jnp.asarray(adj_i)
    ts, tp = [], []
    hops_seen = []
    for bi in range(n_batches):
        s = bi * B
        nodes = np.arange(s, s + B, dtype=np.int32)
        nodes_dev = jnp.asarray(nodes)
        t0 = time.time()
        res = beam_search_batch(
            si, base_dev, base_dev[nodes_dev], jnp.int32(int(ep)),
            k=1, L=L, metric=cfg.metric, max_hops=16 * L + 64,
            capture=L, exclude_self=True, self_ids=nodes_dev,
            expand_width=E, gather_chunk=chunk, visited_dense=dense)
        hops = np.asarray(res.hops)
        ts.append(time.time() - t0)
        hops_seen.append(int(hops.max()))
        t0 = time.time()
        si, sd, deg = _phase_b_step(
            si, sd, deg, res.ret_ids, res.ret_dists, nodes_dev,
            jnp.asarray(np.ones(B, bool)), pidev, base_dev,
            metric=cfg.metric, M=M, W=W, prune_chunk=256)
        float(deg.sum())  # force
        tp.append(time.time() - t0)
    # skip batch 0 (compile)
    est = (np.mean(ts[1:]) + np.mean(tp[1:])) * (N / B)
    print(f"B={B} E={E} chunk={chunk} dense={dense}: "
          f"search {np.mean(ts[1:]):.2f}s step {np.mean(tp[1:]):.2f}s "
          f"max_hops~{hops_seen[-1]} -> est total {est:.0f}s",
          file=sys.stderr, flush=True)
