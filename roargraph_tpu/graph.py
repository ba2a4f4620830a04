"""Padded fixed-width adjacency — the TPU-native replacement for the
reference's ragged ``vector<vector<uint32_t>>`` graphs.

A graph is a dense ``[N, M_max] int32`` array (pad = -1) plus an entry point.
Fixed shape means frontier expansion is a single gather per hop and the whole
search step stays inside one compiled program (SURVEY.md §7.1).

Invariant: each row's valid prefix contains no duplicate ids — required by the
visited-bitmask scatter in :mod:`roargraph_tpu.search` (bits are set with an
add-scatter, so a duplicate id within one row would corrupt its word).
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from . import io as rio

PAD = -1


@dataclasses.dataclass
class PaddedGraph:
    ids: np.ndarray          # [N, M_max] int32, PAD-filled tail per row
    ep: int                  # entry point (medoid)

    @property
    def num_nodes(self) -> int:
        return self.ids.shape[0]

    @property
    def max_degree(self) -> int:
        return self.ids.shape[1]

    def degrees(self) -> np.ndarray:
        return (self.ids != PAD).sum(axis=1).astype(np.int32)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_lists(lists: Sequence[np.ndarray], ep: int,
                   max_degree: int | None = None) -> "PaddedGraph":
        n = len(lists)
        degs = [len(l) for l in lists]
        m = max_degree if max_degree is not None else (max(degs) if n else 0)
        ids = np.full((n, m), PAD, dtype=np.int32)
        for i, l in enumerate(lists):
            l = np.asarray(l, dtype=np.int64)
            # Enforce the row-uniqueness invariant, preserving first occurrence
            # order (the reference lists are already deduplicated by
            # construction; this is belt-and-braces for loaded indexes).
            if l.size:
                _, first = np.unique(l, return_index=True)
                l = l[np.sort(first)][:m]
            ids[i, : l.size] = l.astype(np.int32)
        return PaddedGraph(ids=ids, ep=int(ep))

    def to_lists(self) -> List[np.ndarray]:
        return [row[row != PAD].astype(np.uint32) for row in self.ids]

    # -- serialization ------------------------------------------------------

    def save_npz(self, path: str) -> None:
        """Native format: single compressed npz (fast mmap-free load)."""
        np.savez_compressed(path, ids=self.ids, ep=np.int64(self.ep))

    @staticmethod
    def load_npz(path: str) -> "PaddedGraph":
        with np.load(path) as z:
            return PaddedGraph(ids=z["ids"], ep=int(z["ep"]))

    def save_reference(self, path: str) -> None:
        """Write the reference's projection-index byte format so artifacts are
        interchangeable with the C++ implementation
        (``src/index_bipartite.cpp:2606-2619``)."""
        rio.save_projection_index(path, self.ep, self.to_lists())

    @staticmethod
    def load_reference(path: str, max_degree: int | None = None) -> "PaddedGraph":
        """Read a reference-format index (e.g. the zenodo artifacts,
        ``README.md:126-128``)."""
        ep, lists = rio.load_projection_index(path)
        return PaddedGraph.from_lists(lists, ep, max_degree=max_degree)


def reachable_from(graph: PaddedGraph, start: int | None = None) -> np.ndarray:
    """Boolean mask of nodes reachable from ``start`` (default: entry point)
    by directed BFS — vectorized frontier expansion, no per-node recursion
    (functional equivalent of the reference's legacy dfs reachability,
    ``src/index_bipartite.cpp:2521-2604``)."""
    n = graph.num_nodes
    seen = np.zeros(n, bool)
    frontier = np.array([graph.ep if start is None else start])
    seen[frontier] = True
    while frontier.size:
        nxt = graph.ids[frontier].ravel()
        nxt = nxt[nxt != PAD]
        nxt = np.unique(nxt)
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
    return seen


def repair_connectivity(graph: PaddedGraph, base, metric) -> int:
    """Attach every ep-unreachable node to its nearest reachable neighbor
    (functional equivalent of the reference's legacy tree-ensure pass,
    ``findroot/dfs/CollectPoints``, ``src/index_bipartite.cpp:2521-2604`` —
    unreached by the shipped drivers but kept as a quality tool).

    Mutates ``graph.ids`` in place (widening rows by one column if every
    slot of a chosen anchor is full). Returns the number of edges added."""
    from .config import Metric
    from .ops.topk import knn

    metric = Metric.parse(metric)
    base = np.asarray(base)
    added = 0
    for _ in range(64):  # each round strictly grows reachability
        seen = reachable_from(graph)
        missing = np.flatnonzero(~seen)
        if missing.size == 0:
            break
        reach_ids = np.flatnonzero(seen)
        # nearest reachable anchor for each unreachable node (exact)
        anchor_local, _ = knn(base[missing], base[reach_ids], k=1,
                              metric=metric)
        anchors = reach_ids[anchor_local[:, 0].astype(np.int64)]
        ids = graph.ids
        free = (ids[anchors] == PAD)
        need_widen = ~free.any(axis=1)
        if need_widen.any():
            ids = np.concatenate(
                [ids, np.full((ids.shape[0], 1), PAD, np.int32)], axis=1)
            graph.ids = ids
            free = (ids[anchors] == PAD)
        slot = free.argmax(axis=1)
        # dedup anchors: one new edge per anchor per round
        uniq, first = np.unique(anchors, return_index=True)
        ids[anchors[first], slot[first]] = missing[first].astype(np.int32)
        added += first.size
    return added


def stats(graph: PaddedGraph) -> dict:
    """Degree statistics matching the reference's post-build printout
    (``src/index_bipartite.cpp:1160-1179``)."""
    degs = graph.degrees()
    return {
        "num_nodes": graph.num_nodes,
        "total_degree": int(degs.sum()),
        "avg_degree": float(degs.mean()) if graph.num_nodes else 0.0,
        "max_degree": int(degs.max()) if graph.num_nodes else 0,
        "min_degree": int(degs.min()) if graph.num_nodes else 0,
        "underfull": int((degs < graph.max_degree).sum()),
        "isolated": int((degs == 0).sum()),
    }
