"""Search/eval driver — flag-compatible with the reference's
``test_search_roargraph`` (``tests/test_search_roargraph.cpp:79-106``)::

    python -m roargraph_tpu.cli.search --data_type float --dist ip \
        --base_data_path base.fbin --query_path query.fbin \
        --gt_path gt.bin --projection_index_save_path t2i.index \
        --L_pq 10 20 50 100 --k 10 -T 16 \
        --evaluation_save_path eval.csv

``--engine tpu`` (default) runs the lockstep batched engine;
``--engine cpu`` runs the native C++ OpenMP engine on the same index.
"""
from __future__ import annotations

import argparse

import numpy as np

from .. import io as rio
from ..config import Metric, SearchConfig
from ..graph import PaddedGraph
from .. import eval as reval
from .. import search as rsearch
from .common import add_common, load_vectors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--base_data_path", required=True)
    p.add_argument("--query_path", required=True)
    p.add_argument("--gt_path", required=True)
    p.add_argument("--projection_index_save_path", required=True)
    p.add_argument("--L_pq", type=int, nargs="+", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--evaluation_save_path", default="")
    p.add_argument("--engine", choices=["tpu", "cpu", "tile"], default="tpu")
    p.add_argument("--tile_index_path", default="",
                   help="TileIndex .npz for --engine tile (built on the fly "
                        "from the projection graph when absent/missing)")
    p.add_argument("--tile_T", type=int, nargs="+", default=None,
                   help="tile-engine sweep values: clusters scanned per "
                        "query (defaults to the L_pq list capped at the "
                        "cluster count)")
    p.add_argument("--tile_C", type=int, default=256,
                   help="tile cluster capacity (build-on-the-fly only)")
    p.add_argument("--tile_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--n_seeds", type=int, default=0,
                   help="per-query start candidates from a coarse quantizer "
                        "(built on the fly; 0 = medoid-only reference parity)")
    p.add_argument("--L_bucket", type=int, default=None,
                   help="pad the queue to this width so one compile serves "
                        "the whole L_pq sweep (defaults to max L_pq)")
    args = p.parse_args(argv)

    metric = Metric.parse(args.dist)
    base = load_vectors(args.base_data_path, metric)
    queries = load_vectors(args.query_path, metric)
    gt_ids, gt_dists = rio.load_gt(args.gt_path)
    graph = (PaddedGraph.load_npz(args.projection_index_save_path)
             if args.projection_index_save_path.endswith(".npz")
             else PaddedGraph.load_reference(args.projection_index_save_path))
    print(f"base {base.shape}, queries {queries.shape}, "
          f"graph ep={graph.ep} max_deg={graph.max_degree}")

    for L in args.L_pq:
        if args.k > L:
            raise SystemExit("L_pq must greater or equal than k")

    if args.engine == "tile":
        import os

        import jax.numpy as jnp

        from ..tiles import TileIndex, build_tiles, tile_search, upload
        if args.tile_index_path and os.path.exists(args.tile_index_path):
            tidx = TileIndex.load_npz(args.tile_index_path)
        else:
            tidx = build_tiles(graph, base, cluster_size=args.tile_C,
                               metric=metric)
            if args.tile_index_path:
                tidx.save_npz(args.tile_index_path)
        if args.tile_dtype != "float32":
            tidx = tidx.astype(jnp.bfloat16)
        dev = upload(tidx)
        T_values = args.tile_T or sorted(
            {min(L, tidx.num_clusters) for L in args.L_pq})
        print(f"tile engine: K={tidx.num_clusters} C={tidx.cluster_size} "
              f"{args.tile_dtype}; sweep column 1 is T (clusters scanned)")

        def tile_fn(T):
            return tile_search(tidx, queries, k=args.k, T=T,
                               Lc=max(2 * T, 16), metric=metric,
                               batch_size=args.batch_size,
                               device_arrays=dev)

        reval.sweep(tile_fn, T_values, np.asarray(gt_ids), k=args.k,
                    metric=metric, n_queries=queries.shape[0],
                    gt_dists=np.asarray(gt_dists),
                    csv_path=args.evaluation_save_path or None,
                    verbose=True, raw=True, knob="T")
        return

    if args.engine == "cpu":
        from .. import native

        def fn(cfg: SearchConfig):
            return native.search_native(graph, base, queries, cfg,
                                        num_threads=args.num_threads)
    else:
        sidx = None
        if args.n_seeds:
            from ..ops.seeds import build_seeds
            sidx = build_seeds(base, n_centroids=max(256, base.shape[0] // 64),
                               metric=metric)
        bucket = args.L_bucket or max(args.L_pq)

        def fn(cfg: SearchConfig):
            cfg = SearchConfig(k=cfg.k, L_pq=cfg.L_pq, metric=cfg.metric,
                               batch_size=args.batch_size,
                               n_seeds=args.n_seeds, L_bucket=bucket)
            return rsearch.search(graph, base, queries, cfg, seeds=sidx)

    reval.sweep(fn, args.L_pq, np.asarray(gt_ids), k=args.k, metric=metric,
                n_queries=queries.shape[0], gt_dists=np.asarray(gt_dists),
                csv_path=args.evaluation_save_path or None, verbose=True)


if __name__ == "__main__":
    main()
