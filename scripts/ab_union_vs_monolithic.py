"""A/B: sharded-union graph vs monolithic build at equal N (VERDICT r3 #4).

The 10M serving path unions per-shard RoarGraphs whose cross-shard
navigation comes only from the tile layer (global frontier init + centroid
backstop edges) — `scripts/serve_10m.py`. This experiment measures what
that costs vs a monolithic build of the same data, controlled:

  data     = shard 0 of the 10M protocol (rows 0:N_AB of t2i10m_base)
  mono arm = the chain's monolithic 1.25M build (t2i10m_graph_shard0.npz)
  union arm= the same 1.25M split into SUB sub-shards, each built
             independently exactly like build_10m.py builds its shards
             (sub-local train GT, same canonical config), then unioned
             with serve_10m's offset logic.

Both arms get the same tile build (C=256, Mc=32, bf16) and the same
T sweep against the same exact eval GT. Output: ab_union_1m.json with the
two recall@T/QPS curves.

Usage: python scripts/ab_union_vs_monolithic.py    (resumable, TPU)
Env: AB_SUB (default 4 sub-shards), AB_T (comma Ts), B10M_* data knobs.
"""
import json
import os
import sys
import time

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

N10, D, SEED = (int(os.environ.get("B10M_N", 10_000_000)),
                int(os.environ.get("B10M_D", 200)), 0)
TAG = os.environ.get("B10M_TAG", f"t2i{N10 // 1_000_000}m")
N_AB = int(os.environ.get("AB_N", 1_250_000))
N_TRAIN = int(os.environ.get("B10M_TRAIN", 1_250_000))
SUB = int(os.environ.get("AB_SUB", 4))
N_EVAL, K = 8192, 10


def main():
    import jax
    import jax.numpy as jnp

    import roargraph_tpu as rt
    from roargraph_tpu import eval as reval
    from roargraph_tpu.build import build_roargraph
    from roargraph_tpu.graph import PAD, PaddedGraph
    from roargraph_tpu.ops.topk import knn
    from roargraph_tpu.tiles import TileIndex, build_tiles, tile_search, upload
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    base_all, train_all, eval_q = benchmod.make_data_cached(
        N10, N_TRAIN, N_EVAL, D, SEED, TAG)
    base = np.asarray(base_all[:N_AB])
    train_q = np.asarray(train_all[:N_TRAIN])
    eval_q = np.asarray(eval_q)

    cfg = rt.BuildConfig(
        metric="ip",
        M_sq=int(os.environ.get("B10M_MSQ", 100)),
        M_pjbp=int(os.environ.get("B10M_MPJBP", 35)),
        L_pjpq=int(os.environ.get("B10M_LPJPQ", 500)),
        prune_batch=1024,
        search_batch=int(os.environ.get("B10M_SEARCH_BATCH", 2048)))

    # exact eval GT on the A/B slice
    gt_path = os.path.join("build", f"ab_{N_AB}_eval_gt.npz")
    if os.path.exists(gt_path):
        with np.load(gt_path) as z:
            gt_ids = z["ids"][:, :K].astype(np.int64)
    else:
        t0 = time.time()
        gt_i, _ = knn(jnp.asarray(eval_q), jnp.asarray(base), k=K,
                      metric="ip", query_batch=8192)
        gt_ids = np.asarray(gt_i).astype(np.int64)
        np.savez(gt_path, ids=gt_ids)
        print(f"eval gt: {time.time() - t0:.0f}s", flush=True)

    # ---- union arm: SUB independent sub-shard builds ----
    n_sub = (N_AB + SUB - 1) // SUB
    sub_graphs = []
    train_dev = None
    for s in range(SUB):
        gpath = os.path.join("build", f"ab{N_AB}_graph_sub{s}.npz")
        if os.path.exists(gpath):
            sub_graphs.append(PaddedGraph.load_npz(gpath))
            print(f"sub {s}: cached", flush=True)
            continue
        lo, hi = s * n_sub, min((s + 1) * n_sub, N_AB)
        sub_dev = jnp.asarray(base[lo:hi])
        t0 = time.time()
        if train_dev is None:
            pad = (-N_TRAIN) % 8192
            tq = (np.concatenate([train_q, np.zeros((pad, D), np.float32)])
                  if pad else train_q)
            train_dev = jnp.asarray(tq)
        ids_parts = []
        part = 8192 * 16
        for qlo in range(0, N_TRAIN, part):
            ids, _ = knn(train_dev[qlo: qlo + part], sub_dev, k=cfg.M_sq,
                         metric="ip", query_batch=8192, tile=16384,
                         precision=jax.lax.Precision.DEFAULT,
                         approx="block", return_dists=False)
            ids_parts.append(np.asarray(ids))
        train_ids = np.concatenate(ids_parts)[:N_TRAIN]
        print(f"sub {s}: gt {time.time() - t0:.0f}s", flush=True)
        t0 = time.time()
        g, rep = build_roargraph(sub_dev, train_ids, cfg, verbose=True)
        g.save_npz(gpath)
        sub_graphs.append(g)
        print(f"sub {s}: build {time.time() - t0:.0f}s stats={rep.stats}",
              flush=True)
        del sub_dev
    del train_dev

    width = max(g.ids.shape[1] for g in sub_graphs)
    union = np.full((N_AB, width), PAD, np.int32)
    for s, g in enumerate(sub_graphs):
        lo = s * n_sub
        shifted = np.where(g.ids == PAD, PAD, g.ids + lo)
        union[lo: lo + g.ids.shape[0], : g.ids.shape[1]] = shifted
    ugraph = PaddedGraph(ids=union, ep=int(sub_graphs[0].ep))
    del sub_graphs

    # mono arm: the chain's monolithic shard-0 build when AB_N matches the
    # shard size; at smaller AB_N (a budget-bounded post-chain run) build a
    # monolithic graph of the same slice with the same config
    shard0 = os.path.join("build", f"{TAG}_graph_shard0.npz")
    mono = None
    if os.path.exists(shard0):
        g0 = PaddedGraph.load_npz(shard0)
        if g0.ids.shape[0] == N_AB:
            mono = g0
        del g0
    if mono is None:
        mpath = os.path.join("build", f"ab_graph_mono{N_AB}.npz")
        if os.path.exists(mpath):
            mono = PaddedGraph.load_npz(mpath)
            print("mono: cached", flush=True)
        else:
            mono_dev = jnp.asarray(base)
            pad = (-N_TRAIN) % 8192
            tq = (np.concatenate([train_q, np.zeros((pad, D), np.float32)])
                  if pad else train_q)
            tdev = jnp.asarray(tq)
            t0 = time.time()
            ids_parts = []
            part = 8192 * 16
            for qlo in range(0, N_TRAIN, part):
                ids, _ = knn(tdev[qlo: qlo + part], mono_dev, k=cfg.M_sq,
                             metric="ip", query_batch=8192, tile=16384,
                             precision=jax.lax.Precision.DEFAULT,
                             approx="block", return_dists=False)
                ids_parts.append(np.asarray(ids))
            train_ids = np.concatenate(ids_parts)[:N_TRAIN]
            print(f"mono: gt {time.time() - t0:.0f}s", flush=True)
            t0 = time.time()
            mono, rep = build_roargraph(mono_dev, train_ids, cfg,
                                        verbose=True)
            mono.save_npz(mpath)
            print(f"mono: build {time.time() - t0:.0f}s stats={rep.stats}",
                  flush=True)
            del mono_dev, tdev

    T_values = [int(t) for t in os.environ.get(
        "AB_T", "16,32,64,96,128,192").split(",")]
    result = {"n": N_AB, "sub_shards": SUB, "tile_C": 256, "k": K}
    for arm, graph in (("mono", mono), ("union", ugraph)):
        tpath = os.path.join("build", f"ab{N_AB}_tiles_{arm}.npz")
        if os.path.exists(tpath):
            tidx = TileIndex.load_npz(tpath)
        else:
            t0 = time.time()
            tidx = build_tiles(graph, base, cluster_size=256, Mc=32,
                               metric="ip", fill=0.7)
            tidx.save_npz(tpath)
            print(f"{arm}: tile build {time.time() - t0:.0f}s "
                  f"K={tidx.num_clusters}", flush=True)
        tidx = tidx.astype(jnp.bfloat16)
        dev = upload(tidx)
        eval_dev = jnp.asarray(eval_q)

        def fn(T, _t=tidx, _d=dev, _q=eval_dev):
            return tile_search(_t, _q, k=K, T=T, Lc=max(2 * T, 16),
                               metric="ip", batch_size=8192,
                               device_arrays=_d)

        rows = reval.sweep(fn, T_values, gt_ids, k=K, metric="ip",
                           n_queries=N_EVAL, verbose="stderr", raw=True,
                           knob="T")
        result[arm] = [[r["L_pq"], r["qps"], round(r["recall"], 4)]
                       for r in rows]
        result[f"{arm}_qps@0.95"] = reval.qps_at_recall(rows, 0.95)
        del dev, tidx
        print(f"{arm}: {result[arm]}", flush=True)

    with open(f"ab_union_{N_AB}.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
