"""Serve + sweep a sharded-built large index (scripts/build_10m.py output)
on one chip: assemble the union graph (per-shard adjacency + offsets),
build/cache the global tile index, run the T sweep against the exact eval
groundtruth, and report QPS at recall@10 >= 0.95.

Ordering is budget-aware (the serve runs at the tail of a multi-hour build
chain): the int8 leg — the operating point every probe picked at >=1M — runs
FIRST with an adaptive T extension (the right T at 10M is not knowable in
advance: K grows ~10x vs 1M), and the result JSON is rewritten after every
leg so an interrupted serve still leaves the headline artifact on disk.
Comparison legs (merge_every, fused kernels, early-exit, bf16) run at the
found operating point only, not as full sweeps.

Usage: python scripts/serve_10m.py
Env:   B10M_* as in build_10m.py; SERVE_TILE_C / SERVE_TILE_FILL;
       SERVE_T (comma list of starting T values); SERVE_T_MAX (adaptive cap);
       SERVE_BF16=1 adds a bf16 sweep leg; SERVE_NO_EE / SERVE_NO_ME /
       SERVE_NO_FUSED skip comparison legs; SERVE_SCAN forces a scan impl.
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


def _load_or_build_int8(base):
    """Return the int8 TileIndex, building + caching it if needed.

    Cache is the int8 quantized form (scales + radii included): ~2.9 GB at
    10M vs ~11.4 GB f32 — the f32 savez_compressed alone costs >10 min of
    single-core host time at this scale, and int8 is the serving dtype.
    A pre-existing f32 cache (older runs) is accepted and requantized."""
    import jax.numpy as jnp  # noqa: F401 — jax initialized by caller

    from roargraph_tpu.graph import PAD, PaddedGraph
    from roargraph_tpu.tiles import TileIndex, build_tiles

    tile_C = int(os.environ.get("SERVE_TILE_C", 256))
    fill = float(os.environ.get("SERVE_TILE_FILL", 0.7))
    p8 = os.path.join("build", f"{TAG}_tiles{tile_C}_int8.npz")
    p32 = os.path.join("build", f"{TAG}_tiles{tile_C}.npz")
    if os.path.exists(p8):
        print(f"loaded int8 tile cache {p8}", flush=True)
        return TileIndex.load_npz(p8), tile_C
    if os.path.exists(p32):
        print(f"loaded tile cache {p32}", flush=True)
        tidx = TileIndex.load_npz(p32)
    else:
        # union graph: shard-local adjacencies offset into the global id
        # space (cross-shard navigation comes from the global frontier init
        # + centroid backstop edges; co-access aggregation is intra-shard)
        n_s = (N + S - 1) // S
        graphs = []
        for s in range(S):
            g = PaddedGraph.load_npz(
                os.path.join("build", f"{TAG}_graph_shard{s}.npz"))
            graphs.append(g)
            print(f"union: shard {s} graph loaded", flush=True)
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
        del ugraph, union
    t0 = time.time()
    q8 = tidx.quantize_int8()  # computes radii from the f32 tiles first
    del tidx
    q8.save_npz(p8)
    print(f"int8 quantize+cache: {time.time() - t0:.0f}s -> {p8}", flush=True)
    return q8, tile_C


def main():
    import jax.numpy as jnp

    from roargraph_tpu import eval as reval
    from roargraph_tpu.tiles import tile_search, upload
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.time()
    base, _, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D, SEED,
                                               TAG,
                                        normalize=bool(os.environ.get("B10M_NORM")))
    print(f"data: {time.time() - t0:.0f}s", flush=True)
    with np.load(os.path.join("build", f"{TAG}_eval_gt.npz")) as z:
        gt_ids = z["ids"][:, :K].astype(np.int64)

    q8, tile_C = _load_or_build_int8(base)
    del base
    q_dev = jnp.asarray(eval_q)
    dev8 = upload(q8)

    # scan-impl smoke test: "auto" resolves to the fused-DMA Pallas kernel
    # at this K; if that kernel faults on this backend, fall back to the
    # portable XLA scan instead of burning the driver's serve retries
    scan = os.environ.get("SERVE_SCAN", "auto")
    if scan == "auto":
        try:
            tile_search(q8, q_dev, k=K, T=2, Lc=4, metric="ip",
                        batch_size=8192, device_arrays=dev8)
        except Exception as e:  # noqa: BLE001 — any kernel fault
            print(f"auto scan smoke failed ({type(e).__name__}: {e}); "
                  f"forcing xla scan", flush=True)
            scan = "xla"

    result = {"tag": TAG, "n": N, "d": D, "metric": "ip",
              "scan_impl": scan, "tile_C": tile_C,
              "target_recall": TARGET, "k": K, "n_eval": N_EVAL}

    def write_json():
        # SERVE_OUT_SUFFIX keeps comparison arms (e.g. C=512 tiles) from
        # overwriting the headline artifact
        sfx = os.environ.get("SERVE_OUT_SUFFIX", "")
        with open(f"eval_{TAG}_tiles{sfx}.json", "w") as f:
            json.dump(result, f, indent=1)

    # Queue width: Lc < T truncates the walk (each hop expands one queued
    # cluster), and the 10M Lc probe (eval_t2i10m_lc.json) measured Lc=T
    # vs Lc=2T as recall-identical (same expanded set: the frontier is
    # centroid-score-driven) at +42% QPS — per-hop queue maintenance
    # scales with Lc and dominates at large T. Default factor 1; the
    # round-3 2T default stays selectable via SERVE_LC_FACTOR=2.
    lc_factor = float(os.environ.get("SERVE_LC_FACTOR", 1))
    # engine modes (tiles.py): SERVE_DEDUP=flags + SERVE_EB=E select the
    # large-T serving path (bitmap dedup, E expansions per queue sort)
    dedup = os.environ.get("SERVE_DEDUP", "compare")
    eb = int(os.environ.get("SERVE_EB", 1))

    def int8_fn(T, merge_every=1, early_exit=False, impl=None):
        # T-aware batch: a T=1536/B=8192 program runs ~57 s of device wall
        # at 10M — at the tunnel's long-program fault threshold (T=3072
        # kills the worker 8/8). Halving the batch halves program wall at
        # these device-bound T. Scan bytes scale with T*D, so the threshold
        # is D-aware (laion's 512-d rows hit the wall at 2.56x lower T).
        bsz = 4096 if int(T) * D >= 1024 * 200 else 8192
        return tile_search(q8, q_dev, k=K, T=int(T),
                           Lc=max(int(lc_factor * int(T)), int(T), 16),
                           metric="ip",
                           batch_size=bsz, device_arrays=dev8,
                           scan_impl=impl or scan, merge_every=merge_every,
                           early_exit=early_exit, dedup_impl=dedup,
                           expand_batch=(1 if early_exit else eb))

    # ---- primary leg: int8, adaptive T --------------------------------
    # K at 10M is ~10x the 1M index's; the 1M knee (T~96 of 5587) gives no
    # usable prior for the right T here, so extend the sweep upward until
    # the target is cleared (or recall plateaus / the cap is hit).
    T_values = [int(t) for t in os.environ.get(
        "SERVE_T", "96,192,384,768").split(",")]
    t_cap = int(os.environ.get("SERVE_T_MAX", 4096))
    rows = reval.sweep(int8_fn, T_values, gt_ids, k=K, metric="ip",
                       n_queries=N_EVAL, verbose="stderr", raw=True,
                       knob="T")
    while (max(r["recall"] for r in rows) < TARGET
           and rows[-1]["L_pq"] * 2 <= t_cap):
        if (len(rows) >= 2
                and rows[-1]["recall"] - rows[-2]["recall"] < 0.002):
            print("recall plateaued below target; stopping T extension",
                  flush=True)
            break
        nxt = rows[-1]["L_pq"] * 2
        rows += reval.sweep(int8_fn, [nxt], gt_ids, k=K, metric="ip",
                            n_queries=N_EVAL, verbose="stderr", raw=True,
                            knob="T")
    q8_qps = reval.qps_at_recall(rows, TARGET)
    result["tile_int8_qps_at_recall"] = q8_qps
    result["int8_rows_T_qps_recall"] = [
        [r["L_pq"], r["qps"], r["recall"]] for r in rows]
    write_json()

    # operating point: cheapest T clearing the target, else the max-recall T
    ok_rows = [r for r in rows if r["recall"] >= TARGET]
    best_T = (min((r["L_pq"] for r in ok_rows), default=None)
              or max(rows, key=lambda r: r["recall"])["L_pq"])
    result["best_T"] = best_T

    # ---- comparison legs at the operating point ------------------------
    # deferred merge: bit-identical to per-hop merging (test-pinned), so
    # only the QPS moves — one point per M
    if not os.environ.get("SERVE_NO_ME"):
        me_rows = []
        for me in (2, 4):
            r = reval.sweep(lambda T, _me=me: int8_fn(T, merge_every=_me),
                            [best_T], gt_ids, k=K, metric="ip",
                            n_queries=N_EVAL, verbose="stderr", raw=True,
                            knob="T")[0]
            me_rows.append([me, r["L_pq"], r["qps"], r["recall"]])
            if r["recall"] >= TARGET and q8_qps is not None:
                q8_qps = max(q8_qps, r["qps"])
        result["int8_merge_every_rows_M_T_qps_recall"] = me_rows
        result["tile_int8_qps_at_recall"] = q8_qps
        write_json()

    # fused scan+select kernels (round 4): smoke-test each variant (this
    # backend has program-level failure modes) and record QPS at best_T;
    # exact-equivalent to the unfused path, so recall is a consistency
    # check, never a new operating point
    if not os.environ.get("SERVE_NO_FUSED"):
        fused_rows = []
        for fimpl in ("grouped_pallas_fused", "pallas_fused"):
            try:
                tile_search(q8, q_dev, k=K, T=2, Lc=4, metric="ip",
                            batch_size=8192, device_arrays=dev8,
                            scan_impl=fimpl)
            except Exception as e:  # noqa: BLE001 — any kernel fault
                print(f"fused smoke {fimpl} failed ({type(e).__name__}: "
                      f"{str(e)[:200]})", flush=True)
                continue
            r = reval.sweep(lambda T, _f=fimpl: int8_fn(T, impl=_f),
                            [best_T], gt_ids, k=K, metric="ip",
                            n_queries=N_EVAL, verbose="stderr", raw=True,
                            knob="T")[0]
            fused_rows.append([fimpl, r["L_pq"], r["qps"], r["recall"]])
            if r["recall"] >= TARGET and q8_qps is not None:
                q8_qps = max(q8_qps, r["qps"])
        result["int8_fused_rows_impl_T_qps_recall"] = fused_rows
        result["tile_int8_qps_at_recall"] = q8_qps
        write_json()

    # adaptive early-exit (T becomes a cap; per-query stop on the cluster
    # score bound) — two points bracketing the operating point, where
    # per-query T variance is widest. Gated at 10M-scale K: the first
    # early-exit program at K~56k deterministically kills the tunnel
    # worker (2/2 observed — DESIGN.md round-4); SERVE_EE=1 forces it.
    ee_ok = (q8.num_clusters <= 20_000 or os.environ.get("SERVE_EE"))
    if not os.environ.get("SERVE_NO_EE") and ee_ok:
        ee_rows = reval.sweep(
            lambda T: int8_fn(T, early_exit=True),
            sorted({best_T, min(2 * best_T, t_cap)}), gt_ids, k=K,
            metric="ip", n_queries=N_EVAL, verbose="stderr", raw=True,
            knob="T")
        result["tile_adaptive_qps_at_recall"] = reval.qps_at_recall(
            ee_rows, TARGET)
        result["ee_rows_T_qps_recall"] = [
            [r["L_pq"], r["qps"], r["recall"]] for r in ee_rows]
        write_json()

    # bf16 reference leg (opt-in: doubles HBM vs int8 and the scan is
    # bandwidth-bound, so int8 is expected to dominate at this scale)
    if os.environ.get("SERVE_BF16"):
        del dev8
        from roargraph_tpu.tiles import TileIndex  # noqa: F401

        tile_C_ = tile_C
        p32 = os.path.join("build", f"{TAG}_tiles{tile_C_}.npz")
        if os.path.exists(p32):
            from roargraph_tpu.tiles import TileIndex
            t32 = TileIndex.load_npz(p32).astype(jnp.bfloat16)
            devb = upload(t32)

            def bf16_fn(T):
                return tile_search(t32, q_dev, k=K, T=int(T),
                                   Lc=max(2 * int(T), 16), metric="ip",
                                   batch_size=8192, device_arrays=devb,
                                   scan_impl=scan)

            b_rows = reval.sweep(bf16_fn, [best_T], gt_ids, k=K,
                                 metric="ip", n_queries=N_EVAL,
                                 verbose="stderr", raw=True, knob="T")
            result["bf16_rows_T_qps_recall"] = [
                [r["L_pq"], r["qps"], r["recall"]] for r in b_rows]
            write_json()

    print(json.dumps(result), flush=True)
    write_json()


if __name__ == "__main__":
    main()
