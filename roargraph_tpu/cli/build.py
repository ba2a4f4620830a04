"""RoarGraph build driver — flag-compatible with the reference's
``test_build_roargraph`` (``tests/test_build_roargraph.cpp:34-76``)::

    python -m roargraph_tpu.cli.build --data_type float --dist ip \
        --base_data_path base.fbin --sampled_query_data_path query.train.fbin \
        --projection_index_save_path t2i.index \
        --learn_base_nn_path train.gt.bin \
        --M_sq 100 --M_pjbp 35 --L_pjpq 500 -T 64

If ``--learn_base_nn_path`` is absent the groundtruth is computed in-framework
on the accelerator (the reference requires the external DiskANN step first).
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from .. import io as rio
from ..build import build_roargraph
from ..config import BuildConfig, Metric
from ..ops.topk import knn
from .common import add_common, load_vectors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--base_data_path", required=True)
    p.add_argument("--sampled_query_data_path", required=True)
    p.add_argument("--projection_index_save_path", required=True)
    p.add_argument("--learn_base_nn_path", default=None,
                   help="precomputed train-query->base gt file; computed "
                        "on-device when omitted")
    p.add_argument("--M_sq", type=int, default=100)
    p.add_argument("--M_pjbp", type=int, default=35)
    p.add_argument("--L_pjpq", type=int, default=500)
    p.add_argument("--save_npz", default=None,
                   help="also save the native .npz index format")
    args = p.parse_args(argv)

    metric = Metric.parse(args.dist)
    base = load_vectors(args.base_data_path, metric)
    print(f"base: {base.shape}")

    if args.learn_base_nn_path:
        train_ids, _ = rio.load_gt(args.learn_base_nn_path)
        print(f"loaded learn-base NN: {train_ids.shape}")
    else:
        queries = load_vectors(args.sampled_query_data_path, metric)
        print(f"computing {args.M_sq}-NN groundtruth for {queries.shape[0]} "
              "training queries on-device...")
        t0 = time.time()
        train_ids, _ = knn(queries, base, k=args.M_sq, metric=metric)
        print(f"gt time: {time.time() - t0:.1f}s")

    cfg = BuildConfig(metric=metric, M_sq=args.M_sq, M_pjbp=args.M_pjbp,
                      L_pjpq=args.L_pjpq)
    t0 = time.time()
    graph, report = build_roargraph(base, np.asarray(train_ids), cfg,
                                    verbose=True)
    print(f"indexing time: {time.time() - t0:.1f}")
    print(f"stats: {report.stats}")
    graph.save_reference(args.projection_index_save_path)
    print(f"Save index to {args.projection_index_save_path}")
    if args.save_npz:
        graph.save_npz(args.save_npz)


if __name__ == "__main__":
    main()
