"""Serve + sweep a sharded-built large index (scripts/build_10m.py output)
on one chip: assemble the union graph (per-shard adjacency + offsets),
build/cache the global tile index (bf16), run the T sweep against the exact
eval groundtruth, and report QPS at recall@10 >= 0.95.

Usage: python scripts/serve_10m.py
Env:   B10M_* as in build_10m.py; SERVE_TILE_C / SERVE_TILE_FILL;
       SERVE_T  (comma list of T values)
"""
import json
import os
import sys
import time

# Slow-first-touch VM mitigation (roargraph_tpu/utils/hostmem.py): stop the
# host's proactive reclaim + keep freed numpy temps in the glibc arena.
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_hostmem",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "roargraph_tpu", "utils", "hostmem.py"))
_hostmem = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_hostmem)
_hostmem.harden()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402

N = int(os.environ.get("B10M_N", 10_000_000))
N_TRAIN = int(os.environ.get("B10M_TRAIN", 1_250_000))  # see build_10m.py
N_EVAL = 8192
D = int(os.environ.get("B10M_D", 200))
SEED = 0
S = int(os.environ.get("B10M_SHARDS", 8))
TAG = os.environ.get("B10M_TAG", f"t2i{N // 1_000_000}m")
K = 10
TARGET = 0.95


def main():
    import jax.numpy as jnp

    from roargraph_tpu import eval as reval
    from roargraph_tpu.graph import PAD, PaddedGraph
    from roargraph_tpu.tiles import TileIndex, build_tiles, tile_search, upload
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    n_s = (N + S - 1) // S

    t0 = time.time()
    base, _, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D, SEED,
                                               TAG)
    print(f"data: {time.time() - t0:.0f}s", flush=True)
    with np.load(os.path.join("build", f"{TAG}_eval_gt.npz")) as z:
        gt_ids = z["ids"][:, :K].astype(np.int64)

    tile_C = int(os.environ.get("SERVE_TILE_C", 256))
    fill = float(os.environ.get("SERVE_TILE_FILL", 0.7))
    tpath = os.path.join("build", f"{TAG}_tiles{tile_C}.npz")
    if os.path.exists(tpath):
        tidx = TileIndex.load_npz(tpath)
        print(f"loaded tile cache {tpath}", flush=True)
    else:
        # union graph: shard-local adjacencies offset into the global id
        # space (cross-shard navigation comes from the global frontier init
        # + centroid backstop edges; co-access aggregation is intra-shard)
        graphs = []
        for s in range(S):
            g = PaddedGraph.load_npz(
                os.path.join("build", f"{TAG}_graph_shard{s}.npz"))
            graphs.append(g)
        width = max(g.ids.shape[1] for g in graphs)
        union = np.full((N, width), PAD, np.int32)
        for s, g in enumerate(graphs):
            lo = s * n_s
            ids = g.ids
            shifted = np.where(ids == PAD, PAD, ids + lo)
            union[lo: lo + ids.shape[0], : ids.shape[1]] = shifted
        ugraph = PaddedGraph(ids=union, ep=int(graphs[0].ep))
        del graphs
        t0 = time.time()
        tidx = build_tiles(ugraph, base, cluster_size=tile_C, Mc=32,
                           metric="ip", fill=fill)
        print(f"tile build: {time.time() - t0:.0f}s "
              f"K={tidx.num_clusters}", flush=True)
        tidx.save_npz(tpath)
    tidx = tidx.astype(jnp.bfloat16)
    dev = upload(tidx)

    T_values = [int(t) for t in os.environ.get(
        "SERVE_T", "24,48,96,160,256,384").split(",")]

    # scan-impl smoke test: "auto" resolves to the fused-DMA Pallas kernel
    # at this K; if that kernel faults on this backend, fall back to the
    # portable XLA scan instead of burning the driver's serve retries
    scan = os.environ.get("SERVE_SCAN", "auto")
    if scan == "auto":
        try:
            tile_search(tidx, jnp.asarray(eval_q[:8192]), k=K, T=2, Lc=4,
                        metric="ip", batch_size=8192, device_arrays=dev)
        except Exception as e:  # noqa: BLE001 — any kernel fault
            print(f"auto scan smoke failed ({type(e).__name__}: {e}); "
                  f"forcing xla scan", flush=True)
            scan = "xla"

    merge_every = int(os.environ.get("SERVE_MERGE_EVERY", 1))

    def tile_fn(T):
        return tile_search(tidx, jnp.asarray(eval_q), k=K, T=T,
                           Lc=max(2 * T, 16), metric="ip",
                           batch_size=8192, device_arrays=dev,
                           scan_impl=scan, merge_every=merge_every)

    rows = reval.sweep(tile_fn, T_values, gt_ids, k=K, metric="ip",
                       n_queries=N_EVAL, verbose="stderr", raw=True,
                       knob="T")
    qps = reval.qps_at_recall(rows, TARGET)

    # adaptive early-exit (T becomes a cap; per-query stop on the cluster
    # score bound) — the 10M operating point is where per-query T variance
    # is widest
    tidx = tidx.with_radii()
    ee_rows, ee_qps = [], None
    if not os.environ.get("SERVE_NO_EE"):
        def tile_ee_fn(T):
            return tile_search(tidx, jnp.asarray(eval_q), k=K, T=T,
                               Lc=max(2 * T, 16), metric="ip",
                               batch_size=8192, device_arrays=dev,
                               scan_impl=scan, early_exit=True)

        ee_rows = reval.sweep(tile_ee_fn, T_values, gt_ids, k=K,
                              metric="ip", n_queries=N_EVAL,
                              verbose="stderr", raw=True, knob="T")
        ee_qps = reval.qps_at_recall(ee_rows, TARGET)

    # int8 leg: per-cluster symmetric quantization halves scan bytes vs
    # bf16 — the per-hop cluster scan is the HBM floor at this scale
    # (DESIGN.md hop anatomy), so this is the direct bandwidth lever.
    # Free the bf16 device arrays first: bf16 (~5.7 GB at 10M) + int8
    # (~2.9 GB) don't need to coexist in HBM.
    q8_rows, q8_qps = [], None
    if not os.environ.get("SERVE_NO_INT8"):
        del dev
        q8 = tidx.quantize_int8() if tidx.scales is None else tidx
        del tidx
        dev8 = upload(q8)
        scan8 = os.environ.get("SERVE_SCAN", "auto")
        if scan8 == "auto":
            try:
                tile_search(q8, jnp.asarray(eval_q[:8192]), k=K, T=2, Lc=4,
                            metric="ip", batch_size=8192,
                            device_arrays=dev8)
            except Exception as e:  # noqa: BLE001 — any kernel fault
                print(f"int8 auto scan smoke failed ({type(e).__name__}: "
                      f"{e}); forcing xla scan", flush=True)
                scan8 = "xla"

        def tile8_fn(T):
            return tile_search(q8, jnp.asarray(eval_q), k=K, T=T,
                               Lc=max(2 * T, 16), metric="ip",
                               batch_size=8192, device_arrays=dev8,
                               scan_impl=scan8, merge_every=merge_every)

        q8_rows = reval.sweep(tile8_fn, T_values, gt_ids, k=K, metric="ip",
                              n_queries=N_EVAL, verbose="stderr", raw=True,
                              knob="T")
        q8_qps = reval.qps_at_recall(q8_rows, TARGET)

    best_T = None
    if q8_qps is not None:
        best_T = next(r["L_pq"] for r in q8_rows
                      if r["recall"] >= TARGET and r["qps"] == q8_qps)

    # deferred-merge timing at the int8 operating point: merge_every is
    # bit-identical to per-hop merging (test-pinned), so recall is already
    # known from the sweep above — only the QPS moves. One point per M.
    me_rows = []
    if best_T is not None and not os.environ.get("SERVE_NO_ME"):
        for me in (2, 4):
            def tile8_me_fn(T, _me=me):
                return tile_search(q8, jnp.asarray(eval_q), k=K, T=T,
                                   Lc=max(2 * T, 16), metric="ip",
                                   batch_size=8192, device_arrays=dev8,
                                   scan_impl=scan8, merge_every=_me)

            r = reval.sweep(tile8_me_fn, [best_T], gt_ids, k=K,
                            metric="ip", n_queries=N_EVAL,
                            verbose="stderr", raw=True, knob="T")[0]
            me_rows.append([me, r["L_pq"], r["qps"], r["recall"]])
            if r["recall"] >= TARGET:
                q8_qps = max(q8_qps, r["qps"])

    # fused scan+select kernels at the operating point (round 4): smoke-test
    # each variant (this backend has program-level failure modes) and record
    # QPS at best_T; exact-equivalent to the unfused path, so recall is a
    # consistency check, never a new operating point
    fused_rows = []
    if best_T is not None and not os.environ.get("SERVE_NO_FUSED"):
        for fimpl in ("grouped_pallas_fused", "pallas_fused"):
            try:
                tile_search(q8, jnp.asarray(eval_q[:8192]), k=K, T=2, Lc=4,
                            metric="ip", batch_size=8192, device_arrays=dev8,
                            scan_impl=fimpl)
            except Exception as e:  # noqa: BLE001 — any kernel fault
                print(f"fused smoke {fimpl} failed ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
                continue

            def tile8_fused_fn(T, _f=fimpl):
                return tile_search(q8, jnp.asarray(eval_q), k=K, T=T,
                                   Lc=max(2 * T, 16), metric="ip",
                                   batch_size=8192, device_arrays=dev8,
                                   scan_impl=_f)

            r = reval.sweep(tile8_fused_fn, [best_T], gt_ids, k=K,
                            metric="ip", n_queries=N_EVAL,
                            verbose="stderr", raw=True, knob="T")[0]
            fused_rows.append([fimpl, r["L_pq"], r["qps"], r["recall"]])
            if r["recall"] >= TARGET:
                q8_qps = max(q8_qps, r["qps"])

    result = {"tag": TAG, "n": N, "d": D, "metric": "ip",
              "tile_qps_at_recall": qps,
              "tile_adaptive_qps_at_recall": ee_qps,
              "tile_int8_qps_at_recall": q8_qps,
              "scan_impl": scan, "tile_C": tile_C,
              "target_recall": TARGET, "k": K, "n_eval": N_EVAL,
              "rows_T_qps_recall": [[r["L_pq"], r["qps"], r["recall"]]
                                    for r in rows],
              "ee_rows_T_qps_recall": [[r["L_pq"], r["qps"], r["recall"]]
                                       for r in ee_rows],
              "int8_rows_T_qps_recall": [[r["L_pq"], r["qps"], r["recall"]]
                                         for r in q8_rows],
              "int8_merge_every_rows_M_T_qps_recall": me_rows,
              "int8_fused_rows_impl_T_qps_recall": fused_rows}
    print(json.dumps(result), flush=True)
    with open(f"eval_{TAG}_tiles.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
