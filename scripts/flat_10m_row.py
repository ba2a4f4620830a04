"""The flat TPU-engine 10M row (VERDICT r4 #4, TPU half): the lockstep
beam-search engine over the t2i-10M index, reference L_pq protocol subset.

Same sharded serving semantics as the C++ row (scripts/cpp_10m_row.py):
the 10M index is 8 independent per-shard RoarGraphs, so each shard is
walked from its own medoid and the per-shard top-k merge happens on the
host; QPS charges the SUM of the 8 walks' wall to the batch (one chip runs
them sequentially — on an 8-chip slice they run concurrently, which is the
measured-per-device-wall sharded_search path).

Usage: python scripts/flat_10m_row.py [L1,L2,...]
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
    import jax.numpy as jnp

    from roargraph_tpu import eval as reval
    from roargraph_tpu.graph import PaddedGraph
    from roargraph_tpu.search import beam_search_batch
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    base, _, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D, SEED,
                                                TAG)
    with np.load(os.path.join("build", f"{TAG}_eval_gt.npz")) as z:
        gt_ids = z["ids"][:, :K].astype(np.int64)
    q_dev = jnp.asarray(np.ascontiguousarray(eval_q, np.float32))

    L_values = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
                else [40, 100, 200, 300])
    n_s = (N + S - 1) // S
    BIG = 2**31 - 1

    walls = {L: 0.0 for L in L_values}
    parts = {L: ([], []) for L in L_values}   # ids, dists per shard
    cmps = {L: 0.0 for L in L_values}
    hops = {L: 0.0 for L in L_values}
    for s in range(S):
        g = PaddedGraph.load_npz(
            os.path.join("build", f"{TAG}_graph_shard{s}.npz"))
        lo = s * n_s
        adj_dev = jnp.asarray(g.ids)
        sb_dev = jnp.asarray(
            np.ascontiguousarray(base[lo: lo + g.ids.shape[0]], np.float32))
        for L in L_values:
            # warmup/compile pass (cached across shards: same shapes)
            r = beam_search_batch(adj_dev, sb_dev, q_dev[:256],
                                  jnp.int32(g.ep), k=K, L=L, metric="ip",
                                  max_hops=16 * L + 64)
            np.asarray(r.ids)
            t0 = time.time()
            r = beam_search_batch(adj_dev, sb_dev, q_dev, jnp.int32(g.ep),
                                  k=K, L=L, metric="ip", max_hops=16 * L + 64)
            ids = np.asarray(r.ids)
            dists = np.asarray(r.dists)
            walls[L] += time.time() - t0
            cmps[L] += float(np.asarray(r.cmps).mean())
            hops[L] += float(np.asarray(r.hops).mean())
            parts[L][0].append(np.where(ids >= 0, ids.astype(np.int64) + lo,
                                        np.int64(BIG)))
            parts[L][1].append(np.where(ids >= 0, dists, np.inf))
        del adj_dev, sb_dev
        print(f"shard {s} done ({', '.join(f'{L}:{walls[L]:.0f}s' for L in L_values)})",
              flush=True)

    rows = []
    for L in L_values:
        cat_i = np.concatenate(parts[L][0], axis=1)
        cat_d = np.concatenate(parts[L][1], axis=1)
        order = np.lexsort((cat_i, cat_d), axis=1)[:, :K]
        out_i = np.take_along_axis(cat_i, order, axis=1)
        out_i = np.where(out_i == BIG, -1, out_i)
        recall = reval.recall_at_k(out_i, gt_ids, K)
        qps = N_EVAL / walls[L]
        rows.append({"L_pq": L, "qps": qps, "recall": recall,
                     "cmps": cmps[L], "hops": hops[L],
                     "latency_ms": walls[L] / N_EVAL * 1e3})
        print(f"L={L} qps={qps:.1f} recall={recall:.4f} "
              f"cmps={cmps[L]:.0f} hops={hops[L]:.0f}", flush=True)
    out = {"tag": TAG, "n": N, "d": D, "engine": "flat_tpu_sharded_merge",
           "rows": rows,
           "qps_at_recall": reval.qps_at_recall(rows, TARGET)}
    with open(f"eval_{TAG}_flat.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"qps_at_recall": out["qps_at_recall"]}), flush=True)


if __name__ == "__main__":
    main()
