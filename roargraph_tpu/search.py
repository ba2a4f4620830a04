"""Batched lockstep best-first beam search — the TPU-native redesign of
``SearchRoarGraph`` (``src/index_bipartite.cpp:2311-2420``).

The reference walks the graph one query per thread: a sorted fixed-capacity
queue (``NeighborPriorityQueue``, ``neighbor.h:138-223``), an epoch-tagged
visited array (``visited_list_pool.h``), and one ``Distance::compare`` per
neighbor. On TPU, pointer-chasing scalar code is the wrong shape — instead a
whole *batch* of queries advances one hop per step inside a single jitted
``lax.while_loop``:

- the frontier (closest unexpanded candidate per query) is the argmax of a
  boolean mask over the sorted candidate list — mirroring
  ``closest_unexpanded`` (``neighbor.h:185-194``);
- one gather fetches all frontier adjacency rows, one gather the neighbor
  vectors, one batched contraction all distances (MXU);
- the visited set is a packed ``[B, ceil(N/32)] uint32`` bitmask; bit tests
  are a gather + mask, bit sets an add-scatter (rows are duplicate-free by
  the :class:`~roargraph_tpu.graph.PaddedGraph` invariant);
- queue insertion is a merge of two (dist, id)-sorted lists truncated to L —
  identical semantics to the reference's binary-search insert with id-dedup,
  because the visited mask already guarantees a node enters the queue at most
  once.

Counters: ``cmps`` counts fresh distance evaluations, ``hops`` expansions —
parity with the reference's returned pair (``:2419``). One deliberate
divergence: the entry point is marked visited at init (the reference leaves it
unmarked and relies on queue dedup, ``:2349``), which can make ``cmps``
smaller by at most 1.

Termination: a query is done when its queue holds no unexpanded candidate
(``:2356``); finished queries idle (masked no-ops) until the whole batch is
done — the while_loop's cond is "any query active".
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Metric, SearchConfig
from .graph import PAD, PaddedGraph
from .ops.distance import batched_scores, pointwise_scores

BIG = jnp.int32(2**31 - 1)  # internal queue padding id (sorts after real ids)


class SearchResult(NamedTuple):
    ids: jnp.ndarray     # [B, k] int32 (-1 where fewer than k results)
    dists: jnp.ndarray   # [B, k] f32
    cmps: jnp.ndarray    # [B] int32 — distance computations (parity ``:2397``)
    hops: jnp.ndarray    # [B] int32 — expansions (parity ``:2366``)
    ret_ids: jnp.ndarray | None = None    # [B, R] expanded-order capture
    ret_dists: jnp.ndarray | None = None  # [B, R]


def _merge_sorted(cand_d, cand_i, cand_e, new_d, new_i, L):
    """Merge queue (sorted) with new candidates; keep best L by (dist, id).

    Expanded flags ride along as a payload column. lax.sort with two keys is
    the straightforward formulation; a Pallas merge-path kernel can replace it
    without touching callers."""
    all_d = jnp.concatenate([cand_d, new_d], axis=1)
    all_i = jnp.concatenate([cand_i, new_i], axis=1)
    all_e = jnp.concatenate([cand_e, jnp.zeros_like(new_i)], axis=1)
    all_d, all_i, all_e = jax.lax.sort((all_d, all_i, all_e), num_keys=2)
    return all_d[:, :L], all_i[:, :L], all_e[:, :L]


@functools.partial(
    jax.jit,
    static_argnames=("k", "L", "metric", "max_hops", "capture", "exclude_self"),
)
def beam_search_batch(
    adj: jnp.ndarray,       # [N, Mx] int32 padded adjacency
    base: jnp.ndarray,      # [N, D] vectors
    queries: jnp.ndarray,   # [B, D]
    ep: jnp.ndarray,        # scalar int32 entry point
    *,
    k: int,
    L: int,
    metric: Metric,
    max_hops: int,
    capture: int = 0,        # >0: record (frontier id, dist) per hop, R=capture
    exclude_self: bool = False,
    self_ids: jnp.ndarray | None = None,  # [B] — skipped like ``nbr == tgt``
                                          # in ``SearchProjectionGraphInternal:1328``
) -> SearchResult:
    N, Mx = adj.shape
    B = queries.shape[0]
    W = (N + 31) // 32

    if self_ids is None:
        self_ids = jnp.full((B,), -1, jnp.int32)

    # --- init: queue seeded with the entry point -------------------------
    ep_vec = base[ep][None, :]
    ep_d = pointwise_scores(jnp.broadcast_to(ep_vec, queries.shape), queries,
                            metric)
    cand_d = jnp.full((B, L), jnp.inf, jnp.float32).at[:, 0].set(ep_d)
    cand_i = jnp.full((B, L), BIG, jnp.int32).at[:, 0].set(ep)
    cand_e = jnp.zeros((B, L), jnp.int32)

    visited = jnp.zeros((B, W), jnp.uint32)
    ep_word, ep_bit = ep // 32, jnp.uint32(1) << jnp.uint32(ep % 32)
    visited = visited.at[:, ep_word].set(ep_bit)

    cmps = jnp.ones((B,), jnp.int32)  # the entry-point distance (``:2340``)
    hops = jnp.zeros((B,), jnp.int32)

    R = max(capture, 1)
    ret_i = jnp.full((B, R), -1, jnp.int32)
    ret_d = jnp.full((B, R), jnp.inf, jnp.float32)

    b_rows = jax.lax.broadcasted_iota(jnp.int32, (B, Mx), 0)

    def cond(state):
        cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, it = state
        unexp = (cand_e == 0) & (cand_i != BIG)
        return jnp.any(unexp) & (it < max_hops)

    def body(state):
        cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, it = state

        unexp = (cand_e == 0) & (cand_i != BIG)
        active = jnp.any(unexp, axis=1)
        j = jnp.argmax(unexp, axis=1)                       # first unexpanded
        frontier = cand_i[jnp.arange(B), j]                 # [B]
        frontier_d = cand_d[jnp.arange(B), j]
        cand_e = cand_e.at[jnp.arange(B), j].set(
            jnp.where(active, 1, cand_e[jnp.arange(B), j]))

        f_safe = jnp.clip(frontier, 0, N - 1)
        nbrs = adj[f_safe]                                   # [B, Mx]
        valid = (nbrs != PAD) & active[:, None]
        n_safe = jnp.clip(nbrs, 0, N - 1)

        words = visited[b_rows, n_safe // 32]
        bits = jnp.uint32(1) << (n_safe % 32).astype(jnp.uint32)
        fresh = valid & ((words & bits) == 0)
        if exclude_self:
            fresh = fresh & (nbrs != self_ids[:, None])
        visited = visited.at[b_rows, n_safe // 32].add(
            jnp.where(fresh, bits, jnp.uint32(0)))

        vecs = base[n_safe]                                  # [B, Mx, D]
        d = batched_scores(queries, vecs, metric)
        d = jnp.where(fresh, d, jnp.inf)
        ii = jnp.where(fresh, nbrs, BIG)

        cand_d, cand_i, cand_e = _merge_sorted(cand_d, cand_i, cand_e,
                                               d, ii, L)
        cmps = cmps + jnp.sum(fresh, axis=1).astype(jnp.int32)
        if capture:
            slot = jnp.clip(hops, 0, R - 1)
            ret_i = ret_i.at[jnp.arange(B), slot].set(
                jnp.where(active & (hops < R), frontier,
                          ret_i[jnp.arange(B), slot]))
            ret_d = ret_d.at[jnp.arange(B), slot].set(
                jnp.where(active & (hops < R), frontier_d,
                          ret_d[jnp.arange(B), slot]))
        hops = hops + active.astype(jnp.int32)
        return (cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d,
                it + 1)

    state = (cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d,
             jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, _ = state

    out_i = jnp.where(cand_i[:, :k] == BIG, -1, cand_i[:, :k])
    out_d = cand_d[:, :k]
    if capture:
        return SearchResult(out_i, out_d, cmps, hops, ret_i, ret_d)
    return SearchResult(out_i, out_d, cmps, hops)


# ---------------------------------------------------------------------------
# Host-facing convenience wrapper
# ---------------------------------------------------------------------------

def search(
    graph: PaddedGraph,
    base,
    queries,
    config: SearchConfig,
):
    """Search a batch of queries, looping device-sized blocks on the host.

    Returns numpy (ids [Q, k], dists [Q, k], cmps [Q], hops [Q])."""
    adj = jnp.asarray(graph.ids)
    base_dev = jnp.asarray(base)
    queries = np.asarray(queries)
    Q = queries.shape[0]
    Bsz = min(config.batch_size, Q) if Q else config.batch_size
    ep = jnp.int32(graph.ep)

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
        res = beam_search_batch(
            adj, base_dev, jnp.asarray(qb), ep,
            k=config.k, L=config.L_pq, metric=config.metric,
            max_hops=config.effective_max_hops)
        ids[s:e] = np.asarray(res.ids)[: e - s]
        dists[s:e] = np.asarray(res.dists)[: e - s]
        cmps[s:e] = np.asarray(res.cmps)[: e - s]
        hops[s:e] = np.asarray(res.hops)[: e - s]
    return ids, dists, cmps, hops
