"""Full reference search-sweep protocol on the synthetic bench build.

Runs the reference's exact 57-point L_pq sweep (10..2000, the list in
``/root/reference/run_roargraph_search_test.sh:13``) with k=10 over the
cached bench index (``bench.py``'s synthetic t2i-shaped workload), medoid
start (reference parity), and writes the reference CSV format
(``L_pq,qps,avg_cmps,mean_latency_ms,recall,rderr,avg_hops`` — the rderr
column included as in ``tests/test_search_bipartite.cpp:229-232``).

Artifact: eval_roargraph.csv at the repo root (VERDICT r1 item 5).

Env knobs: SWEEP_N / SWEEP_TRAIN / SWEEP_D / SWEEP_SEED select which cached
bench index to use (defaults match bench.py defaults); SWEEP_CSV overrides
the output path; SWEEP_BATCH the device batch.

Large-index mode (the >=1M protocol artifact, VERDICT r3 item 6):
SWEEP_GRAPH=<graph.npz> SWEEP_BASE_NPY=<base.npy> [SWEEP_ROWS=lo:hi]
[SWEEP_EVAL_NPY=<eval.npy>] runs the same 57-point protocol over any built
graph — e.g. a 1.25M shard of the 10M build — computing exact eval GT
against that base slice on device.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's exact sweep (57 points)
L_SWEEP = [10, 15, 20, 25, 30, 35, 40, 45, 50, 55, 60, 65, 70, 75, 80, 85,
           90, 95, 100, 110, 120, 130, 140, 150, 160, 170, 180, 190, 200,
           220, 240, 260, 280, 300, 350, 400, 450, 500, 550, 600, 650, 700,
           750, 800, 900, 1000, 1100, 1200, 1300, 1400, 1500, 1600, 1700,
           1800, 1900, 2000]


def main():
    N = int(os.environ.get("SWEEP_N", 100_000))
    N_TRAIN = int(os.environ.get("SWEEP_TRAIN", 50_000))
    N_EVAL = int(os.environ.get("SWEEP_EVAL", 8_192))
    D = int(os.environ.get("SWEEP_D", 200))
    SEED = int(os.environ.get("SWEEP_SEED", 0))
    K = 10
    batch = int(os.environ.get("SWEEP_BATCH", 8192))
    csv_path = os.environ.get("SWEEP_CSV", "eval_roargraph.csv")
    sweep_l = L_SWEEP
    if os.environ.get("SWEEP_L"):  # partial rerun, e.g. after a device crash
        sweep_l = [int(x) for x in os.environ["SWEEP_L"].split(",")]

    # SWEEP_RESUME=1: skip L points already in the CSV and append the rest
    # (a watchdog retry after a mid-sweep worker crash keeps its completed
    # rows instead of re-paying the whole sweep — hours at >=1M)
    resume_merge = None
    if os.environ.get("SWEEP_RESUME") and os.path.exists(csv_path):
        done = set()
        with open(csv_path) as f:
            for line in f:
                head = line.split(",", 1)[0].strip()
                if head and not head.startswith("#"):
                    done.add(int(float(head)))
        remaining = [l for l in sweep_l if l not in done]
        if not remaining:
            print(f"# resume: all {len(sweep_l)} points already in "
                  f"{csv_path}", file=sys.stderr, flush=True)
            return
        print(f"# resume: {len(done)} done, {len(remaining)} remaining",
              file=sys.stderr, flush=True)
        sweep_l = remaining
        resume_merge, csv_path = csv_path, csv_path + ".part"

    import roargraph_tpu as rt
    from roargraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from roargraph_tpu import eval as reval
    from roargraph_tpu.ops.topk import knn
    from roargraph_tpu.search import search
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_data

    if os.environ.get("SWEEP_GRAPH"):
        cache = os.environ["SWEEP_GRAPH"]
        graph = rt.PaddedGraph.load_npz(cache)
        base = np.load(os.environ["SWEEP_BASE_NPY"], mmap_mode="r")
        if os.environ.get("SWEEP_ROWS"):
            lo, hi = (int(x) for x in os.environ["SWEEP_ROWS"].split(":"))
            base = np.asarray(base[lo:hi])
        eval_npy = os.environ.get("SWEEP_EVAL_NPY")
        if eval_npy:
            eval_q = np.asarray(np.load(eval_npy, mmap_mode="r")[:N_EVAL])
        else:
            eval_q = make_data(N, N_TRAIN, N_EVAL, D, SEED)[2]
        N = base.shape[0]
    else:
        cache = os.path.join("build",
                             f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
        if not os.path.exists(cache):
            raise SystemExit(f"no cached index at {cache}; run bench.py "
                             f"first")
        graph = rt.PaddedGraph.load_npz(cache)
        base, _, eval_q = make_data(N, N_TRAIN, N_EVAL, D, SEED)
    D = int(np.shape(base)[1])  # authoritative over SWEEP_D in graph mode
    base_dev = jnp.asarray(base)
    # SWEEP_DTYPE=bfloat16 halves the engine's gather bytes/HBM footprint
    # (scores still accumulate f32; ids/cmps/hops semantics unchanged)
    search_base = base_dev
    if os.environ.get("SWEEP_DTYPE", "float32") != "float32":
        search_base = base_dev.astype(jnp.bfloat16)
    eval_q = jnp.asarray(eval_q)
    gt_ids, gt_dists = knn(eval_q, base_dev, k=K, metric="ip")
    # gt dists in the reference's stored convention (raw IP, positive):
    # our IP scores are negated; rderr() un-negates ours, so hand it raw dots
    gt_dists = -np.asarray(gt_dists)

    print(f"platform={jax.devices()[0].platform} N={N} D={D} "
          f"queries={N_EVAL} index={cache}", file=sys.stderr, flush=True)

    # bucketed compile reuse: one program per bucket serves every L_pq in it
    buckets = [int(x) for x in os.environ.get(
        "SWEEP_BUCKETS", "100,512,1024,2048").split(",")]

    def _cfg(c):
        # points above the largest bucket compile their own exact width;
        # batch shrinks with L_pq*N*D so one lockstep program stays under
        # the backend's long-program fault threshold (eval.flat_sweep_batch)
        bucket = next((b for b in buckets if c.L_pq <= b), c.L_pq)
        return rt.SearchConfig(k=c.k, L_pq=c.L_pq, metric=c.metric,
                               batch_size=reval.flat_sweep_batch(
                                   N, D, c.L_pq, batch),
                               L_bucket=bucket)

    def fn(c):
        return search(graph, search_base, eval_q, _cfg(c))

    def warm(c):
        # one device batch: compiles/warms the exact timed program without
        # paying a full extra pass per point (reference warms with 100
        # serial queries, tests/test_search_roargraph.cpp:197-200)
        cfg = _cfg(c)
        search(graph, search_base, eval_q[:min(cfg.batch_size, N_EVAL)],
               cfg)

    t0 = time.time()
    rows = reval.sweep(fn, sweep_l, np.asarray(gt_ids), k=K,
                       metric=rt.Metric.IP, n_queries=N_EVAL,
                       gt_dists=gt_dists, csv_path=csv_path, verbose=True,
                       warmup_fn=warm)
    if resume_merge is not None:
        # fold the .part rows into the original CSV, ordered by L
        with open(csv_path) as f:
            part = [l for l in f if l.strip() and not l.startswith("#")]
        with open(resume_merge) as f:
            kept = [l for l in f if l.strip() and not l.startswith("#")]
        merged = sorted(kept + part, key=lambda l: int(float(l.split(",")[0])))
        with open(resume_merge, "w") as f:
            f.writelines(merged)
        os.remove(csv_path)
        csv_path = resume_merge
    print(f"# sweep wall: {time.time() - t0:.1f}s -> {csv_path}",
          file=sys.stderr, flush=True)
    best = reval.qps_at_recall(rows, 0.95)
    peak = max(r["recall"] for r in rows)
    print(f"# qps@0.95={best}  peak_recall={peak:.4f}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
