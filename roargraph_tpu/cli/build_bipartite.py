"""Bipartite baseline build driver — the reference's
``test_only_build_bipartite`` equivalent::

    python -m roargraph_tpu.cli.build_bipartite --data_type float --dist ip \
        --base_data_path base.fbin --sampled_query_data_path query.train.fbin \
        --learn_base_nn_path train.gt.bin \
        --bipartite_index_save_path bip.index --M_pjbp 35
"""
from __future__ import annotations

import argparse

import numpy as np

from .. import io as rio
from ..bipartite import build_bipartite
from ..config import Metric
from ..ops.topk import knn
from .common import add_common, load_vectors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--base_data_path", required=True)
    p.add_argument("--sampled_query_data_path", required=True)
    p.add_argument("--bipartite_index_save_path", required=True)
    p.add_argument("--learn_base_nn_path", default=None)
    p.add_argument("--M_pjbp", type=int, default=35)
    p.add_argument("--base_width", type=int, default=None,
                   help="cap on base-side reverse edges (default: exact — "
                        "sized to the true max in-degree, reference parity)")
    args = p.parse_args(argv)

    metric = Metric.parse(args.dist)
    base = load_vectors(args.base_data_path, metric)
    if args.learn_base_nn_path:
        train_ids, _ = rio.load_gt(args.learn_base_nn_path)
    else:
        queries = load_vectors(args.sampled_query_data_path, metric)
        train_ids, _ = knn(queries, base, k=args.M_pjbp, metric=metric)
    index = build_bipartite(base.shape[0], np.asarray(train_ids),
                            M_pjbp=args.M_pjbp, base_width=args.base_width,
                            verbose=True)
    index.save_reference(args.bipartite_index_save_path)
    print(f"Save index to {args.bipartite_index_save_path}")


if __name__ == "__main__":
    main()
