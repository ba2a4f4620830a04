"""The pending 10M C++-engine parity row (VERDICT r4 #4, BASELINE.md:47):
the portable-SIMD C++ engine (csrc/roar_native.cpp), 1 thread, over the
t2i-10M union graph, reference L_pq protocol subset, exact eval GT.

CPU-only — safe to run while the TPU is occupied by a build chain (nice it;
the QPS numbers then carry a few-percent contention caveat, recorded in the
output). Union-graph assembly matches scripts/serve_10m.py exactly.

Usage: nice -n 19 python scripts/cpp_10m_row.py [L1,L2,...]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402

N, N_TRAIN, N_EVAL, D, SEED, S = 10_000_000, 1_250_000, 8192, 200, 0, 8
TAG = "t2i10m"
K, TARGET = 10, 0.95


def main():
    from roargraph_tpu import SearchConfig, native
    from roargraph_tpu import eval as reval
    from roargraph_tpu.graph import PAD, PaddedGraph

    t0 = time.time()
    base, _, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D, SEED,
                                                TAG)
    base = np.ascontiguousarray(base, np.float32)  # C++ needs materialized
    eval_q = np.ascontiguousarray(eval_q, np.float32)
    print(f"data: {time.time() - t0:.0f}s", flush=True)
    with np.load(os.path.join("build", f"{TAG}_eval_gt.npz")) as z:
        gt_ids = z["ids"][:, :K].astype(np.int64)

    n_s = (N + S - 1) // S
    t0 = time.time()
    graphs = [PaddedGraph.load_npz(
        os.path.join("build", f"{TAG}_graph_shard{s}.npz"))
        for s in range(S)]
    width = max(g.ids.shape[1] for g in graphs)
    union = np.full((N, width), PAD, np.int32)
    for s, g in enumerate(graphs):
        lo = s * n_s
        ids = g.ids
        union[lo: lo + ids.shape[0], : ids.shape[1]] = np.where(
            ids == PAD, PAD, ids + lo)
    ugraph = PaddedGraph(ids=union, ep=int(graphs[0].ep))
    del graphs
    print(f"union graph: {time.time() - t0:.0f}s (width {width})", flush=True)

    L_values = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
                else [100, 150, 200, 300, 400, 500, 700, 1000])

    def cpu_fn(c):
        return native.search_native(ugraph, base, eval_q, c, num_threads=1)

    rows = reval.sweep(cpu_fn, L_values, gt_ids, k=K, metric="ip",
                       n_queries=N_EVAL, warmup=False, verbose="stderr")
    out = {
        "tag": TAG, "n": N, "d": D, "engine": "cpp_native_1thread",
        "note": ("run niced alongside the laion build chain's host loop on "
                 "the 1-core host; QPS carries a few-percent contention "
                 "penalty"),
        "rows": rows,
        "qps_at_recall": reval.qps_at_recall(rows, TARGET),
    }
    with open(f"eval_{TAG}_cpp.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"qps_at_recall": out["qps_at_recall"]}), flush=True)


if __name__ == "__main__":
    main()
