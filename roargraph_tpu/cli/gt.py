"""compute_groundtruth replacement: exact k-NN on the accelerator.

Mirrors the DiskANN tool invocation the reference depends on
(``README.md:69-74``)::

    python -m roargraph_tpu.cli.gt --dist ip --base_file base.fbin \
        --query_file query.train.fbin --gt_file train.gt.bin --K 100

Output is the gt byte format consumed by both this framework and the
reference's ``LoadLearnBaseKNN`` (``src/index_bipartite.cpp:2622-2642``).
"""
from __future__ import annotations

import argparse
import time

from .. import io as rio
from ..config import Metric
from ..ops.topk import knn
from .common import add_common, load_vectors


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--base_file", required=True)
    p.add_argument("--query_file", required=True)
    p.add_argument("--gt_file", required=True)
    p.add_argument("--K", type=int, default=100)
    p.add_argument("--tile", type=int, default=8192)
    p.add_argument("--query_batch", type=int, default=4096)
    p.add_argument("--approx", action="store_true",
                   help="TPU partial-reduce candidate selection per tile "
                        "(~5x faster merge; near-tied tail candidates may "
                        "differ). Fine for training-query NN lists; do not "
                        "use for eval groundtruth.")
    args = p.parse_args(argv)

    metric = Metric.parse(args.dist)
    base = load_vectors(args.base_file, metric)
    queries = load_vectors(args.query_file, metric)
    print(f"base {base.shape}, queries {queries.shape}, K={args.K}")
    t0 = time.time()
    ids, dists = knn(queries, base, k=args.K, metric=metric,
                     tile=args.tile, query_batch=args.query_batch,
                     approx=args.approx)
    print(f"knn time: {time.time() - t0:.1f}s")
    if metric is Metric.IP:
        dists = -dists  # gt files store raw dot products
    elif metric is Metric.COSINE:
        dists = 2.0 * (1.0 - (-dists))
    rio.save_gt(args.gt_file, ids, dists)
    print(f"saved {args.gt_file}")


if __name__ == "__main__":
    main()
