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
    tiles: "object | None" = None  # tiles.TileIndex (serving engine)

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

    def build_tiles(self, *, cluster_size: int = 256, Mc: int = 32,
                    fill: float = 0.7, dtype=None) -> None:
        """Attach the tile-graph serving engine (tiles.py) derived from this
        RoarGraph. ``dtype`` (e.g. jnp.bfloat16) casts tile storage."""
        from .tiles import build_tiles as _bt
        self.tiles = _bt(self.graph, self.base, cluster_size=cluster_size,
                         Mc=Mc, metric=self.metric, fill=fill)
        if dtype is not None:
            self.tiles = self.tiles.astype(dtype)

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

    def search_tiles(self, queries, *, k: int = 10, T: int = 12,
                     Lc: int | None = None, batch_size: int = 8192):
        """High-throughput serving path over the tile engine (requires
        :meth:`build_tiles`). ``T`` = clusters scanned per query (the
        recall/QPS knob). Returns (ids, dists, cmps, hops)."""
        from .tiles import tile_search

        if self.tiles is None:
            raise ValueError("no tile index: call build_tiles() first")
        queries = np.asarray(queries, np.float32)
        if self.metric.needs_normalize:
            queries = np.asarray(normalize(queries))
        return tile_search(self.tiles, queries, k=k, T=T, Lc=Lc,
                           metric=self.metric, batch_size=batch_size)

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
        if self.tiles is not None:
            self.tiles.save_npz(os.path.join(directory, "tiles.npz"))

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
        tiles = None
        tp = os.path.join(directory, "tiles.npz")
        if os.path.exists(tp):
            from .tiles import TileIndex
            tiles = TileIndex.load_npz(tp)
        return RoarGraphIndex(graph=graph, base=base, metric=metric,
                              seeds=seeds, tiles=tiles)

    def stats(self) -> dict:
        return graph_stats(self.graph)
