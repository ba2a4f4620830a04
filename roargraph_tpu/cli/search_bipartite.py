"""Bipartite baseline search driver — the reference's
``test_search_bipartite`` equivalent (emits the extra rderr CSV column,
``tests/test_search_bipartite.cpp:226-232``)::

    python -m roargraph_tpu.cli.search_bipartite --data_type float --dist ip \
        --base_data_path base.fbin --query_path query.fbin --gt_path gt.bin \
        --bipartite_index_save_path bip.index --L_pq 20 50 100 --k 10
"""
from __future__ import annotations

import argparse

import numpy as np

from .. import io as rio
from ..bipartite import BipartiteIndex, search_bipartite
from ..config import Metric, SearchConfig
from .. import eval as reval
from .common import add_common, load_vectors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--base_data_path", required=True)
    p.add_argument("--query_path", required=True)
    p.add_argument("--gt_path", required=True)
    p.add_argument("--bipartite_index_save_path", required=True)
    p.add_argument("--L_pq", type=int, nargs="+", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--evaluation_save_path", default="")
    p.add_argument("--seed", type=int, default=0,
                   help="seed for the random init points (the reference uses "
                        "a nondeterministic device, ``cpp:287``)")
    args = p.parse_args(argv)

    metric = Metric.parse(args.dist)
    base = load_vectors(args.base_data_path, metric)
    queries = load_vectors(args.query_path, metric)
    gt_ids, gt_dists = rio.load_gt(args.gt_path)
    index = BipartiteIndex.load_reference(args.bipartite_index_save_path,
                                          nd=base.shape[0])

    def fn(cfg: SearchConfig):
        return search_bipartite(index, base, queries, cfg, seed=args.seed)

    reval.sweep(fn, args.L_pq, np.asarray(gt_ids), k=args.k, metric=metric,
                n_queries=queries.shape[0], gt_dists=np.asarray(gt_dists),
                csv_path=args.evaluation_save_path or None, verbose=True)


if __name__ == "__main__":
    main()
