"""High-level index facade — the user-facing equivalent of the reference's
``IndexBipartite`` class (``include/index_bipartite.h:23-145``), bundling the
graph, vectors, metric and optional seed quantizer behind build/save/load/
search methods. Everything underneath is the functional TPU engine.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

from .config import BuildConfig, Metric, SearchConfig
from .graph import PaddedGraph, stats as graph_stats
from .ops.distance import normalize


@dataclasses.dataclass
class RoarGraphIndex:
    graph: PaddedGraph
    base: np.ndarray
    metric: Metric
    seeds: "object | None" = None  # ops.seeds.SeedIndex

    # -- construction --------------------------------------------------

    @staticmethod
    def build(base, train_queries=None, *, train_knn=None,
              config: BuildConfig | None = None, with_seeds: bool = False,
              checkpoint_dir: str | None = None,
              verbose: bool = False) -> "RoarGraphIndex":
        """Full pipeline: (optional) groundtruth -> RoarGraph build.

        Pass either ``train_queries`` (the k-NN lists are computed on-device,
        replacing the reference's external DiskANN step) or a precomputed
        ``train_knn`` id matrix / loaded gt file."""
        from .build import build_roargraph
        from .ops.topk import knn

        config = config or BuildConfig()
        base = np.asarray(base, np.float32)
        if config.metric.needs_normalize:
            base = np.asarray(normalize(base))
        if train_knn is None:
            if train_queries is None:
                raise ValueError("need train_queries or train_knn")
            tq = np.asarray(train_queries, np.float32)
            if config.metric.needs_normalize:
                tq = np.asarray(normalize(tq))
            train_knn, _ = knn(tq, base, k=config.M_sq, metric=config.metric)
        graph, _ = build_roargraph(base, np.asarray(train_knn), config,
                                   verbose=verbose,
                                   checkpoint_dir=checkpoint_dir)
        seeds = None
        if with_seeds:
            from .ops.seeds import build_seeds
            seeds = build_seeds(base,
                                n_centroids=max(256, base.shape[0] // 64),
                                metric=config.metric)
        return RoarGraphIndex(graph=graph, base=base, metric=config.metric,
                              seeds=seeds)

    # -- search ---------------------------------------------------------

    def search(self, queries, *, k: int = 10, L_pq: int = 100,
               config: SearchConfig | None = None):
        """Returns (ids [Q,k], dists [Q,k], cmps [Q], hops [Q])."""
        from . import search as rsearch

        queries = np.asarray(queries, np.float32)
        if self.metric.needs_normalize:
            queries = np.asarray(normalize(queries))
        if config is None:
            n_seeds = 8 if self.seeds is not None else 0
            config = SearchConfig(k=k, L_pq=L_pq, metric=self.metric,
                                  n_seeds=n_seeds)
        return rsearch.search(self.graph, self.base, queries, config,
                              seeds=self.seeds)

    def search_cpu(self, queries, *, k: int = 10, L_pq: int = 100,
                   num_threads: int = 0):
        """The native C++ OpenMP engine over the same index."""
        from . import native

        queries = np.asarray(queries, np.float32)
        if self.metric.needs_normalize:
            queries = np.asarray(normalize(queries))
        cfg = SearchConfig(k=k, L_pq=L_pq, metric=self.metric)
        return native.search_native(self.graph, self.base, queries, cfg,
                                    num_threads=num_threads)

    # -- persistence ----------------------------------------------------

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        self.graph.save_npz(os.path.join(directory, "graph.npz"))
        np.save(os.path.join(directory, "base.npy"), self.base)
        with open(os.path.join(directory, "metric.txt"), "w") as f:
            f.write(self.metric.value)
        if self.seeds is not None:
            self.seeds.save_npz(os.path.join(directory, "seeds.npz"))

    @staticmethod
    def load(directory: str) -> "RoarGraphIndex":
        graph = PaddedGraph.load_npz(os.path.join(directory, "graph.npz"))
        base = np.load(os.path.join(directory, "base.npy"))
        with open(os.path.join(directory, "metric.txt")) as f:
            metric = Metric.parse(f.read().strip())
        seeds = None
        sp = os.path.join(directory, "seeds.npz")
        if os.path.exists(sp):
            from .ops.seeds import SeedIndex
            seeds = SeedIndex.load_npz(sp)
        return RoarGraphIndex(graph=graph, base=base, metric=metric,
                              seeds=seeds)

    def stats(self) -> dict:
        return graph_stats(self.graph)
