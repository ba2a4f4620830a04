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

    # The 10M index is 8 independent per-shard RoarGraphs (the scale-out
    # design: no cross-shard edges — a single union-graph walk from one
    # medoid reaches only its own shard, recall caps at 1/S). The honest
    # flat-engine serving semantics at 10M is therefore the sharded one
    # (dist.sharded_search): walk EVERY shard from its own medoid, merge
    # top-k by (dist, id) on the host. 1-thread QPS charges the sum of all
    # S walks' wall to each query batch.
    n_s = (N + S - 1) // S
    graphs = [PaddedGraph.load_npz(
        os.path.join("build", f"{TAG}_graph_shard{s}.npz"))
        for s in range(S)]
    shard_bases = [base[s * n_s: min((s + 1) * n_s, N)] for s in range(S)]

    L_values = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
                else [60, 100, 150, 200, 300, 500])

    def cpu_fn(c):
        all_i, all_d, all_c, all_h = [], [], [], []
        for s in range(S):
            si, sd, sc, sh = native.search_native(
                graphs[s], shard_bases[s], eval_q, c, num_threads=1)
            all_i.append(np.where(si >= 0, si.astype(np.int64) + s * n_s,
                                  np.int64(2**62)))
            all_d.append(np.where(si >= 0, sd, np.inf))
            all_c.append(sc)
            all_h.append(sh)
        cat_i = np.concatenate(all_i, axis=1)
        cat_d = np.concatenate(all_d, axis=1)
        order = np.lexsort((cat_i, cat_d), axis=1)[:, :K]
        out_i = np.take_along_axis(cat_i, order, axis=1)
        out_d = np.take_along_axis(cat_d, order, axis=1)
        out_i = np.where(out_i == 2**62, -1, out_i).astype(np.int32)
        return (out_i, out_d, np.sum(all_c, axis=0), np.sum(all_h, axis=0))

    rows = reval.sweep(cpu_fn, L_values, gt_ids, k=K, metric="ip",
                       n_queries=N_EVAL, warmup=False, verbose="stderr")
    out = {
        "tag": TAG, "n": N, "d": D,
        "engine": "cpp_native_1thread_sharded_merge",
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
