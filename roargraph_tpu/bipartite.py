"""Bipartite baseline index: the reference's non-projected query-base graph
(``BuildBipartite``/``qbaseNNbipartite``, ``src/index_bipartite.cpp:42-141,
235-280``) and its two-hop beam search (``SearchBipartiteGraph:282-356``).

Graph layout: node ids ``0..nd-1`` are base points, ``nd..nd+nsq-1`` are
training queries. Each query node's out-list is its NN list minus the head;
each head base node receives one reverse edge to the query
(``:264-273``). Search expands a base node by scanning its query neighbors
and then each query's base neighbors, computing distances only on the second
hop (``:324-335``), seeded from 10 random base points (``:289-294``).

TPU formulation: two padded adjacency arrays (base→query and query→base); a
hop gathers the two-level neighborhood as one ``[B, W1*W2]`` block, masks
visited, computes all distances in one batched contraction and merges into
the sorted queue — same lockstep machinery as the projection search.

Capacity note: base-side in-degree is unbounded in the reference (every query
whose head is this node, ``src/index_bipartite.cpp:264-273``). By default the
padded array is sized to the *true* max in-degree (no edges dropped — exact
reference parity). An explicit ``base_width`` caps the width for memory
control; dropped overflow edges are then counted in
``BipartiteIndex.dropped_reverse_edges`` and reported, never silent.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Metric, SearchConfig
from .graph import PAD
from . import io as rio
from .ops.distance import batched_scores

BIG = jnp.int32(2**31 - 1)


@dataclasses.dataclass
class BipartiteIndex:
    base_adj: np.ndarray    # [nd, W1] int32 query ids (0-based), PAD-filled
    query_adj: np.ndarray   # [nsq, W2] int32 base ids, PAD-filled
    # reverse edges dropped by an explicit base_width cap (0 = exact parity)
    dropped_reverse_edges: int = 0

    @property
    def nd(self) -> int:
        return self.base_adj.shape[0]

    @property
    def nsq(self) -> int:
        return self.query_adj.shape[0]

    # reference byte format: one ragged file over nd+nsq nodes
    # (``Save:2045-2056`` / ``Load:2058-2071``)
    def save_reference(self, path: str) -> None:
        lists = [row[row != PAD].astype(np.uint32) for row in self.base_adj]
        lists += [(row[row != PAD] ).astype(np.uint32)
                  for row in self.query_adj]
        # query ids in base rows are stored offset by nd
        nd = self.nd
        lists[:nd] = [l + nd for l in lists[:nd]]
        rio.save_bipartite_index(path, lists)

    @staticmethod
    def load_reference(path: str, nd: int,
                       base_width: int | None = None) -> "BipartiteIndex":
        lists = rio.load_bipartite_index(path)
        nsq = len(lists) - nd
        w1 = base_width or max((len(l) for l in lists[:nd]), default=1)
        w2 = max((len(l) for l in lists[nd:]), default=1)
        base_adj = np.full((nd, w1), PAD, np.int32)
        query_adj = np.full((nsq, w2), PAD, np.int32)
        for i, l in enumerate(lists[:nd]):
            l = np.asarray(l, np.int64)[:w1] - nd
            base_adj[i, : l.size] = l.astype(np.int32)
        for i, l in enumerate(lists[nd:]):
            l = np.asarray(l, np.int64)[:w2]
            query_adj[i, : l.size] = l.astype(np.int32)
        return BipartiteIndex(base_adj=base_adj, query_adj=query_adj)


def build_bipartite(n_base: int, train_knn: np.ndarray, M_pjbp: int,
                    *, base_width: int | None = None,
                    verbose: bool = False) -> BipartiteIndex:
    """Form the bipartite graph from training-query NN lists.

    Parity with ``qbaseNNbipartite`` (``src/index_bipartite.cpp:252-278``):
    query node out-list = first ``M_pjbp`` NNs minus the head; head gets one
    reverse edge per query (kept in query-id order). ``base_width=None``
    (default) sizes the padded base rows to the true max in-degree — no edge
    is ever dropped, matching the reference's unbounded ``push_back``
    (``:264-273``). An explicit cap drops overflow deterministically (lowest
    query ids kept) and records the count."""
    knn = np.asarray(train_knn)[:, :M_pjbp].astype(np.int64)
    nsq = knn.shape[0]
    heads = knn[:, 0]

    query_adj = np.full((nsq, M_pjbp - 1), PAD, np.int32)
    cand = knn[:, 1:]
    keep = cand != heads[:, None]
    rank = np.cumsum(keep, axis=1) - 1
    rows = np.broadcast_to(np.arange(nsq)[:, None], cand.shape)[keep]
    query_adj[rows, rank[keep]] = cand[keep].astype(np.int32)

    # In-degree stats via unique (O(nsq) memory) so the OOM guard below runs
    # BEFORE any n_base-proportional allocation — a dense bincount at
    # n_base=300M would itself be a 2.4 GB transient.
    _, ucounts = np.unique(heads, return_counts=True)
    max_indeg = int(ucounts.max()) if ucounts.size else 0
    if base_width is None:
        base_width = max(max_indeg, 1)
        dropped = 0
        # The dense padded layout costs n_base * base_width int32; a single
        # hot head (one base point that is the head NN of a large slice of
        # the training set) can blow this up quadratically. Refuse clearly
        # instead of OOM-ing: the caller picks an explicit cap (dropped
        # edges are counted, never silent).
        if n_base * base_width > (1 << 31):
            raise ValueError(
                f"unbounded bipartite base rows need n_base x max-in-degree "
                f"= {n_base} x {base_width} int32 (> 8 GB); pass an "
                f"explicit base_width cap (e.g. a high quantile of the "
                f"in-degree distribution)")
    else:
        dropped = int(np.maximum(ucounts - base_width, 0).sum())
        if dropped and verbose:
            import sys
            print(f"build_bipartite: base_width={base_width} drops "
                  f"{dropped} reverse edges (max in-degree "
                  f"{max_indeg})", file=sys.stderr)
    base_adj = np.full((n_base, base_width), PAD, np.int32)
    order = np.argsort(heads, kind="stable")  # deterministic query-id order
    h = heads[order]
    pos = np.arange(nsq) - np.maximum.accumulate(
        np.where(np.r_[True, h[1:] != h[:-1]], np.arange(nsq), 0))
    ok = pos < base_width
    base_adj[h[ok], pos[ok]] = order[ok].astype(np.int32)
    return BipartiteIndex(base_adj=base_adj, query_adj=query_adj,
                          dropped_reverse_edges=dropped)


class BipartiteResult(NamedTuple):
    ids: jnp.ndarray
    dists: jnp.ndarray
    cmps: jnp.ndarray
    hops: jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("k", "L", "metric", "max_hops", "n_init"))
def bipartite_search_batch(
    base_adj: jnp.ndarray,    # [nd, W1]
    query_adj: jnp.ndarray,   # [nsq, W2]
    base: jnp.ndarray,        # [nd, D]
    queries: jnp.ndarray,     # [B, D]
    seed: jnp.ndarray,        # scalar uint32 — deterministic init points
    *,
    k: int,
    L: int,
    metric: Metric,
    max_hops: int,
    n_init: int = 10,
) -> BipartiteResult:
    nd, W1 = base_adj.shape
    nsq, W2 = query_adj.shape
    B = queries.shape[0]
    Wb = (nd + 31) // 32

    # 10 random base-side inits per query (``:289-312``), deterministic here.
    key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
    inits = jax.random.randint(key, (B, n_init), 0, nd, dtype=jnp.int32)
    init_d = batched_scores(queries, base[inits], metric)

    # mark inits visited (parity ``:310``) — dedup duplicates first so the
    # bitmask add-scatter stays single-writer per bit
    sort_i = jnp.sort(inits, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), sort_i[:, 1:] == sort_i[:, :-1]], axis=1)
    b_rows_i = jax.lax.broadcasted_iota(jnp.int32, (B, n_init), 0)
    visited = jnp.zeros((B, Wb), jnp.uint32)
    ids_u = jnp.where(dup, 0, sort_i)
    bits_u = jnp.where(dup, jnp.uint32(0),
                       jnp.uint32(1) << (ids_u % 32).astype(jnp.uint32))
    visited = visited.at[b_rows_i, ids_u // 32].add(bits_u)

    # seed queue with unique inits (duplicates masked to BIG/inf)
    d_sorted = jnp.take_along_axis(init_d, jnp.argsort(inits, axis=1), axis=1)
    seed_i = jnp.where(dup, BIG, sort_i)
    seed_d = jnp.where(dup, jnp.inf, d_sorted)
    pad_n = max(L - n_init, 0)
    cand_d = jnp.concatenate(
        [seed_d, jnp.full((B, pad_n), jnp.inf)], axis=1)[:, :L]
    cand_i = jnp.concatenate(
        [seed_i, jnp.full((B, pad_n), BIG, jnp.int32)], axis=1)[:, :L]
    cand_d, cand_i = jax.lax.sort((cand_d, cand_i), num_keys=2)
    cand_e = jnp.zeros((B, L), jnp.int32)

    cmps = jnp.full((B,), n_init, jnp.int32)
    hops = jnp.zeros((B,), jnp.int32)
    F = W1 * W2
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (B, F), 0)

    def cond(state):
        cand_d, cand_i, cand_e, visited, cmps, hops, it = state
        return jnp.any((cand_e == 0) & (cand_i != BIG)) & (it < max_hops)

    def body(state):
        cand_d, cand_i, cand_e, visited, cmps, hops, it = state
        unexp = (cand_e == 0) & (cand_i != BIG)
        active = jnp.any(unexp, axis=1)
        j = jnp.argmax(unexp, axis=1)
        frontier = cand_i[jnp.arange(B), j]
        cand_e = cand_e.at[jnp.arange(B), j].set(
            jnp.where(active, 1, cand_e[jnp.arange(B), j]))

        f_safe = jnp.clip(frontier, 0, nd - 1)
        qnbrs = base_adj[f_safe]                           # [B, W1]
        q_valid = (qnbrs != PAD) & active[:, None]
        q_safe = jnp.clip(qnbrs, 0, nsq - 1)
        bnbrs = query_adj[q_safe].reshape(B, F)            # [B, W1*W2]
        valid = (bnbrs != PAD) & jnp.repeat(q_valid, W2, axis=1)
        n_safe = jnp.clip(bnbrs, 0, nd - 1)

        # two-hop blocks can contain intra-row duplicates: keep only the
        # first occurrence per row before touching the visited bitmask
        ord_ = jnp.argsort(jnp.where(valid, n_safe, BIG), axis=1)
        s_ids = jnp.take_along_axis(n_safe, ord_, axis=1)
        s_val = jnp.take_along_axis(valid, ord_, axis=1)
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), s_ids[:, 1:] != s_ids[:, :-1]], axis=1)
        s_val = s_val & first
        inv = jnp.argsort(ord_, axis=1)
        valid = jnp.take_along_axis(s_val, inv, axis=1)

        words = visited[b_rows, n_safe // 32]
        bits = jnp.uint32(1) << (n_safe % 32).astype(jnp.uint32)
        fresh = valid & ((words & bits) == 0)
        visited = visited.at[b_rows, n_safe // 32].add(
            jnp.where(fresh, bits, jnp.uint32(0)))

        d = batched_scores(queries, base[n_safe], metric)
        d = jnp.where(fresh, d, jnp.inf)
        ii = jnp.where(fresh, bnbrs, BIG)
        all_d = jnp.concatenate([cand_d, d], axis=1)
        all_i = jnp.concatenate([cand_i, ii], axis=1)
        all_e = jnp.concatenate([cand_e, jnp.zeros_like(ii)], axis=1)
        all_d, all_i, all_e = jax.lax.sort((all_d, all_i, all_e), num_keys=2)
        cmps = cmps + jnp.sum(fresh, axis=1).astype(jnp.int32)
        hops = hops + active.astype(jnp.int32)
        return (all_d[:, :L], all_i[:, :L], all_e[:, :L], visited, cmps,
                hops, it + 1)

    state = (cand_d, cand_i, cand_e, visited, cmps, hops, jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    cand_d, cand_i, _, _, cmps, hops, _ = state
    out_i = jnp.where(cand_i[:, :k] == BIG, -1, cand_i[:, :k])
    return BipartiteResult(out_i, cand_d[:, :k], cmps, hops)


def search_bipartite(index: BipartiteIndex, base, queries,
                     config: SearchConfig, *, seed: int = 0, n_init: int = 10):
    """Host wrapper over :func:`bipartite_search_batch`."""
    ba = jnp.asarray(index.base_adj)
    qa = jnp.asarray(index.query_adj)
    base_dev = jnp.asarray(base)
    queries = np.asarray(queries)
    Q = queries.shape[0]
    Bsz = min(config.batch_size, Q) if Q else config.batch_size
    ids = np.empty((Q, config.k), np.int32)
    dists = np.empty((Q, config.k), np.float32)
    cmps = np.empty((Q,), np.int32)
    hops = np.empty((Q,), np.int32)
    for s in range(0, Q, Bsz):
        e = min(s + Bsz, Q)
        qb = queries[s:e]
        if e - s < Bsz:
            qb = np.concatenate(
                [qb, np.zeros((Bsz - (e - s), qb.shape[1]), qb.dtype)])
        res = bipartite_search_batch(
            ba, qa, base_dev, jnp.asarray(qb), jnp.uint32(seed + s),
            k=config.k, L=config.L_pq, metric=config.metric,
            max_hops=config.effective_max_hops, n_init=n_init)
        ids[s:e] = np.asarray(res.ids)[: e - s]
        dists[s:e] = np.asarray(res.dists)[: e - s]
        cmps[s:e] = np.asarray(res.cmps)[: e - s]
        hops[s:e] = np.asarray(res.hops)[: e - s]
    return ids, dists, cmps, hops
