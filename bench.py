"""Benchmark driver: QPS at recall@10 >= 0.95 on a synthetic t2i-like
cross-modal workload (200-d, MIPS — the shape of the paper's headline t2i-10M
protocol, BASELINE.md) comparing the TPU engines (tile-graph serving engine +
reference-parity lockstep engine) against the C++ OpenMP CPU engine over the
same RoarGraph.

Prints ONE JSON line:
  {"metric": ..., "value": <best tpu qps @ 0.95 recall>, "unit": "qps",
   "vs_baseline": <tpu_qps / cpu_qps>, ...aux fields}

Timing: each sweep point reports the single post-warmup pass (the reference
protocol); min-of-passes rides along as the auxiliary qps_best column.

Environment knobs: BENCH_N (base size), BENCH_TRAIN, BENCH_EVAL, BENCH_SEED,
BENCH_FRESH=1 to ignore caches; BENCH_TILE_C / BENCH_TILE_FILL /
BENCH_TILE_DTYPE for the tile engine.
"""
import json
import os
import subprocess
import sys
import time

# Slow-first-touch VM mitigation (roargraph_tpu/utils/hostmem.py): stop the
# host's proactive reclaim + keep freed numpy temps in the glibc arena.
# Loaded by file path so nothing jax-heavy imports before the re-exec.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_hostmem", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "roargraph_tpu", "utils", "hostmem.py"))
_hostmem = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_hostmem)
_hostmem.harden()

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def supervise() -> int:
    """Crash-retry supervisor: run the bench in a child process and relaunch
    it on failure (fresh process = fresh tunnel client), up to BENCH_RETRIES
    attempts. Every expensive stage (train GT, phase A, timed phase-B state,
    tile index) is cached/checkpointed under build/, so a relaunch resumes
    rather than recomputes — a tunnel-worker death mid-phase-B (the
    round-3 failure: BENCH_r03.json, FAILED_PRECONDITION at build.py:571)
    costs one checkpoint window, not the round's number."""
    retries = int(os.environ.get("BENCH_RETRIES", 3))
    env = dict(os.environ, BENCH_CHILD="1")
    last_json = None
    for attempt in range(retries + 1):
        if attempt:
            log(f"bench supervisor: child failed, retry {attempt}/{retries} "
                f"(caches under build/ resume completed stages)")
            # a BENCH_FRESH run has purged caches at this point; the retry
            # must *resume* the fresh build, not purge it again
            env.pop("BENCH_FRESH", None)
            time.sleep(10.0 * attempt)  # give a dying tunnel worker time
        p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                             env=env, stdout=subprocess.PIPE, text=True)
        for line in p.stdout:  # stderr passes through; stdout is filtered
            line = line.rstrip("\n")
            if line.startswith("{"):
                last_json = line
            else:
                log(line)
        p.wait()
        if p.returncode == 0 and last_json:
            print(last_json)
            return 0
    return p.returncode or 1


def make_data(n, n_train, n_eval, d, seed):
    rng = np.random.default_rng(seed)
    # base: mixture of clusters (image embeddings); queries: shifted/noisier
    # distribution (text embeddings) — the cross-modal regime.
    n_clusters = 64
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 0.8
    asg = rng.integers(0, n_clusters, n)
    base = (centers[asg] +
            rng.standard_normal((n, d)).astype(np.float32) * 0.6)
    shift = rng.standard_normal((1, d)).astype(np.float32) * 0.4
    q_asg = rng.integers(0, n_clusters, n_train + n_eval)
    queries = (centers[q_asg] * 0.85 + shift +
               rng.standard_normal((n_train + n_eval, d)).astype(np.float32))
    return base, queries[:n_train], queries[n_train:]


def make_data_cached(n, n_train, n_eval, d, seed, tag, normalize=False):
    """make_data with an on-disk .npy cache (mmap on reload): regenerating
    the 10M set costs ~10 min of single-core RNG per process launch, which
    every build/serve restart would otherwise repay.

    ``normalize=True`` row-normalizes at cache-WRITE time (the laion/webvid
    convention: unit CLIP embeddings under IP — ``prepare_for_clip_webvid.py``
    re-normalizes after pooling), so every reload is already normalized and
    the cached mmap stays read-only."""
    paths = {k: os.path.join("build", f"{tag}_{k}.npy")
             for k in ("base", "train", "eval")}
    if all(os.path.exists(p) for p in paths.values()):
        return tuple(np.load(paths[k], mmap_mode="r")
                     for k in ("base", "train", "eval"))
    base, train_q, eval_q = make_data(n, n_train, n_eval, d, seed)
    os.makedirs("build", exist_ok=True)
    for k, arr in (("base", base), ("train", train_q), ("eval", eval_q)):
        if normalize:
            np.divide(arr, np.linalg.norm(arr, axis=1, keepdims=True),
                      out=arr)
        np.save(paths[k], arr)
    return base, train_q, eval_q


def main():
    t_start = time.time()
    N = int(os.environ.get("BENCH_N", 100_000))
    N_TRAIN = int(os.environ.get("BENCH_TRAIN", 50_000))
    N_EVAL = int(os.environ.get("BENCH_EVAL", 8_192))
    D = int(os.environ.get("BENCH_D", 200))
    SEED = int(os.environ.get("BENCH_SEED", 0))
    METRIC_STR = os.environ.get("BENCH_METRIC", "ip")  # ip | cosine | l2
    K = 10
    TARGET = 0.95

    import roargraph_tpu as rt
    from roargraph_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from roargraph_tpu import eval as reval
    from roargraph_tpu import native
    from roargraph_tpu.build import build_roargraph
    from roargraph_tpu.ops.topk import knn
    from roargraph_tpu.search import search

    import jax
    platform = jax.devices()[0].platform
    log(f"platform: {platform}, devices: {jax.devices()}")

    METRIC = rt.Metric.parse(METRIC_STR)
    base, train_q, eval_q = make_data(N, N_TRAIN, N_EVAL, D, SEED)
    import jax.numpy as jnp
    if METRIC.needs_normalize:
        # cosine = normalize-then-IP, the reference's load-time convention.
        # Host-side numpy (seconds) — routing multi-GB arrays through the
        # device relay just to divide by row norms costs ~10 min/5 GB.
        for arr in (base, train_q, eval_q):
            np.divide(arr, np.linalg.norm(arr, axis=1, keepdims=True),
                      out=arr)
    base_dev = jnp.asarray(base)  # single upload shared by gt/build/search
    eval_q = jnp.asarray(eval_q)  # ditto for the sweeps' query set
    cfg = rt.BuildConfig(
        metric=METRIC, M_sq=100, M_pjbp=35, L_pjpq=500,
        prune_batch=int(os.environ.get("BENCH_PRUNE_BATCH", 1024)),
        search_batch=int(os.environ.get("BENCH_SEARCH_BATCH", 1024)))

    mtag = "" if METRIC_STR == "ip" else f"_{METRIC_STR}"
    cache = os.path.join("build",
                         f"bench_idx_{N}_{N_TRAIN}_{D}_{SEED}{mtag}.npz")
    if os.environ.get("BENCH_FRESH"):
        # purge-once semantics: delete the caches now and build as normal
        # below, so a supervisor retry after a mid-build crash RESUMES the
        # fresh build from its checkpoints instead of purging again
        import glob
        import shutil
        stem = cache[:-4]
        for p in glob.glob(stem + "*"):
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
        for p in glob.glob(os.path.join(
                "build", f"bench_gt_{N}_{N_TRAIN}_{D}_{SEED}{mtag}.npz")):
            os.remove(p)
        os.environ.pop("BENCH_FRESH")
    gt_s = build_s = None
    if os.path.exists(cache):
        graph = rt.PaddedGraph.load_npz(cache)
        log(f"loaded cached index {cache}")
    else:
        gt_cache = os.path.join(
            "build", f"bench_gt_{N}_{N_TRAIN}_{D}_{SEED}{mtag}.npz")
        if os.path.exists(gt_cache):
            with np.load(gt_cache) as z:
                train_ids = z["ids"]
            log(f"loaded cached train gt {gt_cache}")
        else:
            t0 = time.time()
            # BENCH_GT_APPROX: "block" = block-min per-tile selection (the
            # fast path, scripts/probe_gt_select.py), any other non-empty
            # value = approx_min_k, unset = exact
            apx = os.environ.get("BENCH_GT_APPROX", "")
            train_ids, _ = knn(train_q, base_dev, k=cfg.M_sq, metric=METRIC,
                               query_batch=8192,
                               approx=(apx if apx == "block" else bool(apx)))
            gt_s = time.time() - t0
            log(f"groundtruth: {gt_s:.1f}s for {N_TRAIN}x{N} k={cfg.M_sq}")
            os.makedirs("build", exist_ok=True)
            np.savez(gt_cache, ids=train_ids)
        t0 = time.time()
        # resumable at large N: an interrupted run (or round end) keeps its
        # phase-A result + periodic phase-B state under build/ckpt_*
        ckpt = cache.replace(".npz", "_ckpt")
        graph, report = build_roargraph(base_dev, train_ids, cfg,
                                        verbose=True, checkpoint_dir=ckpt)
        build_s = time.time() - t0
        log(f"build: {build_s:.1f}s  stats={report.stats}")
        os.makedirs("build", exist_ok=True)
        graph.save_npz(cache)

    gt_ids, _ = knn(eval_q, base_dev, k=K, metric=METRIC)

    # --- coarse quantizer for seeded starts (cached with the index) ---
    from roargraph_tpu.ops.seeds import SeedIndex, build_seeds
    seed_cache = cache.replace(".npz", "_seeds.npz")
    if os.path.exists(seed_cache):
        sidx = SeedIndex.load_npz(seed_cache)
    else:
        # device array reused (no second HBM copy of base); centroid count
        # capped — past ~32k the seed sweep matmul cost outgrows the hop
        # savings and k-means itself becomes the bench bottleneck
        sidx = build_seeds(base_dev, n_centroids=min(32_768, max(256, N // 64)),
                           iters=4, metric=METRIC)
        sidx.save_npz(seed_cache)
    log(f"seed quantizer: {sidx.seed_ids.size} representatives")

    L_values = [10, 20, 40, 80, 150, 300, 500]
    batch = int(os.environ.get("BENCH_BATCH", 8192))

    # --- tile engine (the TPU-native serving path, tiles.py) -----------
    from roargraph_tpu.tiles import TileIndex, build_tiles, tile_search, upload
    import jax.numpy as jnp2
    tile_C = int(os.environ.get("BENCH_TILE_C", 256))
    tile_fill = float(os.environ.get("BENCH_TILE_FILL", 0.7))
    tile_dtype = os.environ.get("BENCH_TILE_DTYPE", "bfloat16")
    tile_tag = (f"_tiles{tile_C}" if tile_fill == 0.7
                else f"_tiles{tile_C}_f{tile_fill}")
    tile_cache = cache.replace(".npz", f"{tile_tag}.npz")
    tile_build_s = None
    if os.path.exists(tile_cache):
        tidx = TileIndex.load_npz(tile_cache)
    else:
        t0 = time.time()
        tidx = build_tiles(graph, base, cluster_size=tile_C, Mc=32,
                           metric=METRIC, fill=tile_fill)
        tile_build_s = time.time() - t0
        log(f"tile index: {tile_build_s:.1f}s K={tidx.num_clusters}")
        tidx.save_npz(tile_cache)
    if tile_dtype == "int8":
        tidx = tidx.quantize_int8()
    elif tile_dtype != "float32":
        tidx = tidx.astype(jnp2.bfloat16)
    tile_dev = upload(tidx)
    T_values = [4, 6, 8, 12, 16, 24, 32, 48]
    if N >= 500_000:  # larger corpora need more scanned clusters for 0.95
        T_values += [64, 96, 128, 192]

    tile_scan = os.environ.get("BENCH_TILE_SCAN", "auto")
    # engine knobs (tiles.py large-T serving modes): queue-width factor
    # (Lc = factor*T; 1 measured recall-identical to 2 and +42% at 10M),
    # dedup impl, expansion batch
    tile_lcf = float(os.environ.get("BENCH_TILE_LC_FACTOR", 2))
    tile_dedup = os.environ.get("BENCH_TILE_DEDUP", "compare")
    tile_eb = int(os.environ.get("BENCH_TILE_EB", 1))

    def tile_fn(T):
        # sweep knob: clusters scanned per query (rides the L_pq column)
        return tile_search(tidx, eval_q, k=K, T=T,
                           Lc=max(int(tile_lcf * T), T, 16), metric=METRIC,
                           batch_size=batch, device_arrays=tile_dev,
                           scan_impl=tile_scan, dedup_impl=tile_dedup,
                           expand_batch=tile_eb)

    log(f"tile sweep ({tile_dtype}, C={tidx.cluster_size}, "
        f"K={tidx.num_clusters}; column 1 is T = clusters scanned):")
    tile_rows = reval.sweep(tile_fn, T_values, gt_ids, k=K,
                            metric=METRIC, n_queries=N_EVAL,
                            verbose="stderr", raw=True, knob="T")
    tile_qps = reval.qps_at_recall(tile_rows, TARGET)

    # --- adaptive early-exit sweep (T becomes a cap; easy queries stop
    # when no queued cluster's score bound beats their k-th result) ------
    tile_adaptive_qps = None
    if N >= 500_000 or os.environ.get("BENCH_TILE_ADAPTIVE"):
        tidx_r = tidx.with_radii()  # once — not per sweep point

        def tile_ee_fn(T):
            return tile_search(tidx_r, eval_q, k=K, T=T,
                               Lc=max(2 * T, 16), metric=METRIC,
                               batch_size=batch, device_arrays=tile_dev,
                               early_exit=True)

        log("tile sweep (adaptive early-exit; column 1 is the T cap):")
        tile_ee_rows = reval.sweep(tile_ee_fn, T_values, gt_ids, k=K,
                                   metric=METRIC, n_queries=N_EVAL,
                                   verbose="stderr", raw=True, knob="T")
        tile_adaptive_qps = reval.qps_at_recall(tile_ee_rows, TARGET)

    # --- streaming throughput at the operating point -------------------
    # The reference's protocol keeps 16 threads saturated for the whole
    # query set; the one-pass number above instead pays one un-overlapped
    # dispatch+fetch bubble. qps_stream is the steady-state analog: R
    # back-to-back passes dispatched before any fetch (serving pipeline).
    best_T = None
    if tile_qps is not None:
        # the same row qps_at_recall picked for the headline tile_qps
        best_T = next(r["L_pq"] for r in tile_rows
                      if r["recall"] >= TARGET and r["qps"] == tile_qps)
    tile_stream_qps = None
    if best_T is not None:
        from roargraph_tpu.tiles import _tile_search_packed
        R = 4
        tiles_a, gids_a, cents_a, adj_a, norms_a = tile_dev[:5]
        ac_a = tile_dev[5] if len(tile_dev) > 5 else None
        acn_a = tile_dev[6] if len(tile_dev) > 6 else None
        qb = eval_q[:batch] if eval_q.shape[0] >= batch else eval_q

        stream_scan = tile_scan if tile_scan != "auto" else "grouped"

        def one_pass():
            return _tile_search_packed(
                tiles_a, gids_a, cents_a, adj_a, qb, norms_a, None,
                ac_a, acn_a, k=K,
                T=best_T, Lc=max(2 * best_T, 16), metric=METRIC,
                use_graph=True, scan_impl=stream_scan)

        np.asarray(one_pass())  # warm
        t0 = time.time()
        outs = [one_pass() for _ in range(R)]
        for o in outs:
            np.asarray(o)
        tile_stream_qps = R * qb.shape[0] / (time.time() - t0)
        log(f"tile stream qps @T={best_T}: {tile_stream_qps:.0f}")

    # --- flat engine sweeps: reference-parity (medoid start) + seeded ---
    bucket = max(L_values)  # one compiled program serves the whole sweep
    # BENCH_FLAT_DTYPE=bfloat16: halve the flat engine's vector-gather
    # bytes + HBM footprint (scores still accumulate f32; ids/cmps/hops
    # semantics unchanged, dists carry bf16 quantization)
    flat_base = base_dev
    if os.environ.get("BENCH_FLAT_DTYPE", "float32") != "float32":
        flat_base = base_dev.astype(jnp2.bfloat16)

    def _fbatch(c):
        # batch shrinks with L_pq*N*D so one lockstep program stays under
        # the backend's long-program fault threshold (the medoid sweep at
        # N=1M/L=500/B=8192 reproducibly kills the tunnel worker)
        return reval.flat_sweep_batch(N, D, c.L_pq, batch)

    def tpu_fn(c):
        c2 = rt.SearchConfig(k=c.k, L_pq=c.L_pq, metric=c.metric,
                             batch_size=_fbatch(c), L_bucket=bucket)
        return search(graph, flat_base, eval_q, c2)

    def tpu_seeded_fn(c):
        c2 = rt.SearchConfig(k=c.k, L_pq=c.L_pq, metric=c.metric,
                             batch_size=_fbatch(c), n_seeds=8,
                             L_bucket=bucket)
        return search(graph, flat_base, eval_q, c2, seeds=sidx)

    def tpu_dedup_fn(c):
        # visited-free flat engine (identical ids/dists/hops; re-scores
        # uncounted): the fast-flat serving mode where the visited bitmask
        # gather/scatter dominates the hop (N >= ~1M, probe_merge.py)
        c2 = rt.SearchConfig(k=c.k, L_pq=c.L_pq, metric=c.metric,
                             batch_size=_fbatch(c), n_seeds=8,
                             L_bucket=bucket, visited_mode="dedup")
        return search(graph, flat_base, eval_q, c2, seeds=sidx)

    # The device degrades within long processes (tunnel tenancy); run the
    # stronger seeded mode first so it gets the fast phase.
    dedup_rows, tpu_dedup_qps = [], None
    if N >= 500_000 or os.environ.get("BENCH_FLAT_DEDUP"):
        log("TPU sweep (seeded start, dedup visited):")
        dedup_rows = reval.sweep(tpu_dedup_fn, L_values, gt_ids, k=K,
                                 metric=METRIC, n_queries=N_EVAL,
                                 verbose="stderr")
        tpu_dedup_qps = reval.qps_at_recall(dedup_rows, TARGET)
    log("TPU sweep (seeded start):")
    seeded_rows = reval.sweep(tpu_seeded_fn, L_values, gt_ids, k=K,
                              metric=METRIC, n_queries=N_EVAL,
                              verbose="stderr")
    log("TPU sweep (medoid start):")
    tpu_rows = reval.sweep(tpu_fn, L_values, gt_ids, k=K,
                           metric=METRIC, n_queries=N_EVAL,
                           verbose="stderr")
    tpu_plain_qps = reval.qps_at_recall(tpu_rows, TARGET)
    tpu_seeded_qps = reval.qps_at_recall(seeded_rows, TARGET)
    tpu_qps = max([q for q in (tpu_plain_qps, tpu_seeded_qps, tpu_dedup_qps,
                               tile_qps)
                   if q is not None], default=None)
    best_recall = max(r["recall"]
                      for r in tpu_rows + seeded_rows + dedup_rows
                      + tile_rows)

    # --- CPU native baseline sweep (reference-engine semantics) ---
    cpu_qps = None
    threads = 0
    if native.available():
        threads = native.max_threads()

        def cpu_fn(c):
            return native.search_native(graph, base, eval_q, c,
                                        num_threads=threads)

        cpu_rows = reval.sweep(cpu_fn, L_values, gt_ids, k=K,
                               metric=METRIC, n_queries=N_EVAL,
                               warmup=False, verbose="stderr")
        cpu_qps = reval.qps_at_recall(cpu_rows, TARGET)

    value = tpu_qps if tpu_qps is not None else 0.0
    vs = (value / cpu_qps) if (cpu_qps and value) else None
    out = {
        "metric": (f"qps@recall{TARGET}_k{K}_synth-t2i-{N//1000}k-d{D}"
                   f"-{METRIC_STR}"),
        "value": round(value, 1),
        "unit": "qps",
        "vs_baseline": round(vs, 3) if vs else None,
        "tile_qps": round(tile_qps, 1) if tile_qps else None,
        "tile_stream_qps": (round(tile_stream_qps, 1)
                            if tile_stream_qps else None),
        "tile_adaptive_qps": (round(tile_adaptive_qps, 1)
                              if tile_adaptive_qps else None),
        "tile_config": f"C{tidx.cluster_size}_{tile_dtype}",
        "tpu_medoid_qps": round(tpu_plain_qps, 1) if tpu_plain_qps else None,
        "tpu_seeded_qps": round(tpu_seeded_qps, 1) if tpu_seeded_qps else None,
        "tpu_flat_dedup_qps": (round(tpu_dedup_qps, 1)
                               if tpu_dedup_qps else None),
        "cpu_baseline_qps": round(cpu_qps, 1) if cpu_qps else None,
        "cpu_threads": threads,
        "platform": platform,
        "best_recall": round(best_recall, 4),
        "gt_s": round(gt_s, 1) if gt_s else None,
        "build_s": round(build_s, 1) if build_s else None,
        "total_bench_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if (os.environ.get("BENCH_CHILD")
            or os.environ.get("BENCH_SUPERVISE") == "0"):
        main()
    else:
        sys.exit(supervise())
