"""Canonical-parameter cross-validation at 100k points (VERDICT r3 item 7).

The module-scope crossval test (`tests/test_crossval_cpp.py`) proves byte
compatibility and semantic agreement at 1.5k points with small parameters.
This script closes the remaining gap: the SAME comparison at the paper's
canonical build parameters (`/root/reference/README.md:92-98`:
``M_sq=100, M_pjbp=35, L_pjpq=500``, dist=ip) on the 100k bench workload —
our TPU-built index vs an index built by the ACTUAL reference C++
(compiled out-of-tree, single thread), each one served by BOTH engines,
recall@10/QPS curves overlaid.

Stages (resumable; artifacts under build/crossval_canon/):

  python scripts/crossval_canonical.py cpu   # fbins, C++ build, C++ sweeps
  python scripts/crossval_canonical.py tpu   # our-engine sweeps (needs TPU)
  python scripts/crossval_canonical.py report

The cpu stage is niced to stay out of the way of a concurrently running
TPU driver's dispatch loop (this host has one core).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = os.path.join(REPO, "build", "crossval_canon")
BIN = os.path.join(REPO, "build", "crossval", "crossval")

N, N_TRAIN, N_EVAL, D, SEED = 100_000, 50_000, 8192, 200, 0
M_SQ, M_PJBP, L_PJPQ = 100, 35, 500
K = 10
L_SWEEP = [10, 20, 40, 60, 100, 200, 500]
GT_CACHE = os.path.join(REPO, "build",
                        f"bench_gt_{N}_{N_TRAIN}_{D}_{SEED}.npz")
OUR_IDX = os.path.join(REPO, "build",
                       f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}.npz")
RESULTS = os.path.join(WORK, "results.json")


def _paths():
    return {k: os.path.join(WORK, f"{k}") for k in
            ("base.fbin", "train_q.fbin", "eval_q.fbin", "train_gt.bin",
             "eval_gt.npz", "cpp.index", "ours.index")}


def _load_results():
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def _save_results(res):
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)


def recall_at_k(ids, gt_ids, k):
    hits = 0
    for row, grow in zip(ids, gt_ids):
        hits += len(set(int(x) for x in row[:k])
                    & set(int(x) for x in grow[:k]))
    return hits / (len(ids) * k)


def stage_cpu():
    from roargraph_tpu import io as rio

    os.makedirs(WORK, exist_ok=True)
    p = _paths()
    import bench as benchmod
    base, train_q, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)

    if not os.path.exists(p["base.fbin"]):
        rio.save_fbin(p["base.fbin"], base)
        rio.save_fbin(p["train_q.fbin"], train_q)
        rio.save_fbin(p["eval_q.fbin"], eval_q)
        print("fbins written", flush=True)

    if not os.path.exists(p["train_gt.bin"]):
        with np.load(GT_CACHE) as z:
            ids = z["ids"].astype(np.uint32)
        # the reference build consumes only the id half of the gt file
        # (src/index_bipartite.cpp:2622-2642; README.md:64) — dists zeroed
        rio.save_gt(p["train_gt.bin"], ids,
                    np.zeros(ids.shape, np.float32))
        print("train gt written", flush=True)

    if not os.path.exists(p["eval_gt.npz"]):
        t0 = time.time()
        gt = np.empty((N_EVAL, K), np.int64)
        for i in range(0, N_EVAL, 1024):
            q = eval_q[i:i + 1024]
            s = q @ base.T  # MIPS: larger is better
            gt[i:i + q.shape[0]] = np.argsort(-s, axis=1)[:, :K]
        np.savez(p["eval_gt.npz"], ids=gt)
        print(f"eval gt: {time.time() - t0:.0f}s", flush=True)

    if not os.path.exists(BIN):
        out = subprocess.run(
            ["sh", os.path.join(REPO, "scripts", "crossval_cpp", "build.sh")],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-800:]
        print("crossval binary built", flush=True)

    res = _load_results()
    if not os.path.exists(p["cpp.index"]):
        t0 = time.time()
        out = subprocess.run(
            ["nice", "-n", "19", BIN, "build", p["base.fbin"],
             p["train_q.fbin"], p["train_gt.bin"], p["cpp.index"], "ip",
             str(M_SQ), str(M_PJBP), str(L_PJPQ)],
            capture_output=True, text=True)
        assert out.returncode == 0, out.stderr[-800:]
        res["cpp_build_s"] = round(time.time() - t0, 1)
        _save_results(res)
        print(f"C++ build: {res['cpp_build_s']}s", flush=True)

    if not os.path.exists(p["ours.index"]):
        from roargraph_tpu.graph import PaddedGraph
        g = PaddedGraph.load_npz(OUR_IDX)
        g.save_reference(p["ours.index"])
        print("our index exported to reference format", flush=True)

    with np.load(p["eval_gt.npz"]) as z:
        eval_gt = z["ids"]
    for name, idx in (("cpp", p["cpp.index"]), ("ours", p["ours.index"])):
        key = f"cpp_engine_{name}_index"
        if key in res:
            continue
        curve = []
        for L in L_SWEEP:
            out_ids = os.path.join(WORK, f"ids_{name}_{L}.bin")
            out = subprocess.run(
                ["nice", "-n", "19", BIN, "search", p["base.fbin"],
                 p["train_q.fbin"], idx, p["eval_q.fbin"], "ip",
                 str(K), str(L), out_ids],
                capture_output=True, text=True)
            assert out.returncode == 0, out.stderr[-800:]
            toks = out.stdout.split()
            secs = float(toks[toks.index("search_s") + 1])
            raw = np.fromfile(out_ids, np.uint32)
            ids = raw[2:].reshape(N_EVAL, K)
            r = recall_at_k(ids, eval_gt, K)
            curve.append({"L": L, "recall": round(r, 4),
                          "qps": round(N_EVAL / secs, 1)})
            print(f"cpp engine / {name} index L={L}: recall {r:.4f} "
                  f"qps {N_EVAL / secs:.0f}", flush=True)
        res[key] = curve
        _save_results(res)


def stage_tpu():
    import roargraph_tpu as rt
    from roargraph_tpu.graph import PaddedGraph
    from roargraph_tpu.search import search

    p = _paths()
    import bench as benchmod
    base, _, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
    with np.load(p["eval_gt.npz"]) as z:
        eval_gt = z["ids"]
    res = _load_results()
    graphs = {"cpp": PaddedGraph.load_reference(p["cpp.index"]),
              "ours": PaddedGraph.load_npz(OUR_IDX)}
    import jax.numpy as jnp
    base_dev = jnp.asarray(base)
    for name, g in graphs.items():
        key = f"our_engine_{name}_index"
        if key in res:
            continue
        curve = []
        for L in L_SWEEP:
            cfg = rt.SearchConfig(k=K, L_pq=L, metric="ip")
            t0 = time.time()
            ids, dists, cmps, hops = search(g, base_dev, eval_q, cfg)
            warm = time.time() - t0
            t0 = time.time()
            ids, dists, cmps, hops = search(g, base_dev, eval_q, cfg)
            secs = time.time() - t0
            r = recall_at_k(np.asarray(ids), eval_gt, K)
            curve.append({"L": L, "recall": round(r, 4),
                          "qps": round(N_EVAL / secs, 1),
                          "warm_s": round(warm, 1)})
            print(f"our engine / {name} index L={L}: recall {r:.4f} "
                  f"qps {N_EVAL / secs:.0f}", flush=True)
        res[key] = curve
        _save_results(res)


def stage_report():
    res = _load_results()
    print(json.dumps(res, indent=1, sort_keys=True))
    for eng in ("cpp_engine", "our_engine"):
        a, b = res.get(f"{eng}_cpp_index"), res.get(f"{eng}_ours_index")
        if not (a and b):
            continue
        print(f"\n{eng}: recall deltas (ours - cpp) per L:")
        for ra, rb in zip(a, b):
            print(f"  L={ra['L']:>4}  cpp {ra['recall']:.4f}  "
                  f"ours {rb['recall']:.4f}  d={rb['recall']-ra['recall']:+.4f}")


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if stage == "cpu":
        # the axon plugin overrides the env-var route; force via jax.config
        # before any backend initialization (tests/conftest.py note)
        import jax
        jax.config.update("jax_platforms", "cpu")
        stage_cpu()
    elif stage == "tpu":
        stage_tpu()
    else:
        stage_report()
