"""Batched lockstep best-first beam search — the TPU-native redesign of
``SearchRoarGraph`` (``src/index_bipartite.cpp:2311-2420``).

The reference walks the graph one query per thread: a sorted fixed-capacity
queue (``NeighborPriorityQueue``, ``neighbor.h:138-223``), an epoch-tagged
visited array (``visited_list_pool.h``), and one ``Distance::compare`` per
neighbor. On TPU, pointer-chasing scalar code is the wrong shape — instead a
whole *batch* of queries advances one hop per step inside a single jitted
``lax.while_loop``:

- the frontier (closest unexpanded candidate per query) is selected from the
  sorted candidate list — mirroring ``closest_unexpanded``
  (``neighbor.h:185-194``);
- one gather fetches all frontier adjacency rows, one gather the (fresh)
  neighbor vectors, one batched contraction all distances (MXU);
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
(``:2356``). In the plain engine the whole batch runs until its slowest query
finishes (masked no-ops for the rest). The **segmented engine**
(:func:`search_segmented`) removes that straggler tax: it runs bounded-hop
segments and, between segments, retires finished queries and compacts the
survivors into power-of-two-smaller batches on device — total device work
tracks *sum* of per-query hops instead of ``B x max``.
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


@functools.partial(jax.jit, donate_argnums=())
def pack_results(ids, dists, cmps, hops):
    """Pack the four per-batch result arrays into ONE [B, 2k+2] int32 buffer
    (dists bitcast) on device. Through a high-RTT device relay, four
    separate D2H fetches cost more than the search itself; the host unpacks
    with :func:`unpack_results`."""
    return jnp.concatenate(
        [ids, jax.lax.bitcast_convert_type(dists, jnp.int32),
         cmps[:, None], hops[:, None]], axis=1)


def unpack_results(packed: np.ndarray, k: int):
    """Host-side inverse of :func:`pack_results` (numpy in, numpy out)."""
    ids = packed[:, :k]
    dists = packed[:, k: 2 * k].copy().view(np.float32)
    return ids, dists, packed[:, 2 * k], packed[:, 2 * k + 1]


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


def _merge_sorted_dedup(cand_d, cand_i, cand_e, new_d, new_i, L):
    """Dedup-merge for the visited-free search mode: new candidates may be
    re-scores of nodes already in the queue. Duplicates are collapsed by id
    with provenance priority expanded > queue-unexpanded > new — the exact
    analog of the bitmask's first-score-wins rule (the in-queue copy IS the
    first score; a re-score is discarded even if it differs by an ulp from
    a different scoring program, e.g. the init-state ep path). Sort by
    (id, -priority, dist), mask non-first per id group, re-sort by
    (dist, id)."""
    B = cand_d.shape[0]
    all_d = jnp.concatenate([cand_d, new_d], axis=1)
    all_i = jnp.concatenate([cand_i, new_i], axis=1)
    qp = jnp.where(cand_e == 1, jnp.int32(2), jnp.int32(1))
    all_p = jnp.concatenate([qp, jnp.zeros_like(new_i)], axis=1)
    i1, np1, d1 = jax.lax.sort((all_i, -all_p, all_d), num_keys=3)
    e1 = jnp.where(-np1 == 2, jnp.int32(1), jnp.int32(0))
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), i1[:, 1:] == i1[:, :-1]], axis=1)
    d1 = jnp.where(dup, jnp.inf, d1)
    i1 = jnp.where(dup, BIG, i1)
    e1 = jnp.where(dup, 0, e1)
    d2, i2, e2 = jax.lax.sort((d1, i1, e1), num_keys=2)
    return d2[:, :L], i2[:, :L], e2[:, :L]


# ---------------------------------------------------------------------------
# The hop body (shared by the plain and segmented engines)
# ---------------------------------------------------------------------------

# Below this word count, visited-bit test/set run as one fused dense reduce
# over the whole bitmask row instead of per-element gather/scatter — dense
# compute beats random access on TPU up to ~4k words (measured: 1.4 ms vs
# 4.5 ms per hop at W=3125; crossover ~N 300k).
DENSE_VISITED_MAX_WORDS = 4096


def _make_hop(adj, base, queries, self_ids, *, L, metric, capture, R,
              exclude_self, gather_chunk, expand_width, L_eff=None,
              visited_dense=None, visited_mode="bitmask"):
    """Build (cond, body) over the state tuple
    (cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, it).

    ``visited_mode="dedup"`` drops the visited bitmask entirely: every valid
    neighbor is (re-)scored and duplicates are collapsed in the queue merge
    (:func:`_merge_sorted_dedup`). Queue evolution — hence ids/dists/hops
    and the expansion-order capture — is IDENTICAL to the bitmask mode
    (re-scores have bit-identical keys; a node dropped from the queue can
    never re-enter because the top-L only improves under the (dist, id)
    total order), but ``cmps`` counts re-scores, and the O(B * N / 32)
    visited state plus its gather/scatter (the single largest per-hop cost
    at N >= 1M, scripts/probe_merge.py) disappear. Used by the phase-B
    internal search, where cmps accounting is not reported."""
    N, Mx = adj.shape
    B = queries.shape[0]
    E = expand_width
    EM = E * Mx
    W = (N + 31) // 32
    dedup = visited_mode == "dedup"
    merge = _merge_sorted_dedup if dedup else _merge_sorted
    if visited_dense is None:
        visited_dense = (not dedup) and W <= DENSE_VISITED_MAX_WORDS
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (B, EM), 0)

    if L_eff is None:
        def cap(cd, ci, ce):
            return cd, ci, ce
    else:
        # dynamic queue capacity: arrays are padded to the static width L,
        # but the live queue is the first L_eff entries — masking the tail
        # after each merge is exactly the reference's capacity-L_eff insert
        qcol = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)

        def cap(cd, ci, ce):
            live = qcol < L_eff
            return (jnp.where(live, cd, jnp.inf),
                    jnp.where(live, ci, BIG),
                    jnp.where(live, ce, 0))

    def cond(state):
        cand_d, cand_i, cand_e, *_ = state
        return jnp.any((cand_e == 0) & (cand_i != BIG))

    def body(state):
        cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, it = state

        unexp = (cand_e == 0) & (cand_i != BIG)
        active = jnp.any(unexp, axis=1)
        if E == 1:
            jj = jnp.argmax(unexp, axis=1)[:, None]          # first unexpanded
            picked = active[:, None]
        else:
            # first E unexpanded positions, best-first (queue is sorted)
            jj = jnp.argsort(jnp.where(unexp, 0, 1), axis=1,
                             stable=True)[:, :E]             # [B, E]
            picked = jnp.take_along_axis(unexp, jj, axis=1)  # [B, E]
        frontier = jnp.where(picked,
                             jnp.take_along_axis(cand_i, jj, axis=1), BIG)
        frontier_d = jnp.take_along_axis(cand_d, jj, axis=1)
        b_e = jax.lax.broadcasted_iota(jnp.int32, jj.shape, 0)
        cand_e = cand_e.at[b_e, jj].set(
            jnp.where(picked, 1, jnp.take_along_axis(cand_e, jj, axis=1)))

        f_safe = jnp.clip(frontier, 0, N - 1)
        nbrs = adj[f_safe].reshape(B, EM)                    # [B, E*Mx]
        valid = (nbrs != PAD) & jnp.repeat(picked, Mx, axis=1)
        if E > 1:
            # the same node can neighbor several expanded frontiers; keep the
            # first occurrence per row so the visited add-scatter stays
            # single-writer per bit
            ordr = jnp.argsort(jnp.where(valid, nbrs, BIG), axis=1)
            s_ids = jnp.take_along_axis(nbrs, ordr, axis=1)
            s_val = jnp.take_along_axis(valid, ordr, axis=1)
            first = jnp.concatenate(
                [jnp.ones((B, 1), bool), s_ids[:, 1:] != s_ids[:, :-1]],
                axis=1)
            s_val = s_val & first
            valid = jnp.take_along_axis(s_val, jnp.argsort(ordr, axis=1),
                                        axis=1)
        n_safe = jnp.clip(nbrs, 0, N - 1)

        if dedup:
            fresh = valid
        else:
            w_idx = n_safe // 32
            bits = jnp.uint32(1) << (n_safe % 32).astype(jnp.uint32)
            if visited_dense:
                iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
                eq = w_idx[:, :, None] == iw               # fused, [B, EM, W]
                words = jnp.sum(
                    jnp.where(eq, visited[:, None, :], jnp.uint32(0)), axis=2)
            else:
                words = visited[b_rows, w_idx]
            fresh = valid & ((words & bits) == 0)
        if exclude_self:
            fresh = fresh & (nbrs != self_ids[:, None])
        use_chunks = gather_chunk and gather_chunk < EM
        if dedup:
            pass
        elif visited_dense:
            delta = jnp.sum(jnp.where(eq & fresh[:, :, None],
                                      bits[:, :, None], jnp.uint32(0)),
                            axis=1)                        # [B, W]
            visited = visited | delta
        elif not use_chunks:
            visited = visited.at[b_rows, w_idx].add(
                jnp.where(fresh, bits, jnp.uint32(0)))

        if use_chunks:
            # Only fresh neighbors need vectors; in steady state ~90% of a
            # frontier's neighbors are already visited, so the dominant HBM
            # row gather shrinks by ~n_fresh/EM when fresh ids are compacted
            # to the front and gathered in fixed-size chunks. An inner
            # while_loop covers early hops where many neighbors are fresh;
            # queue contents are insertion-order independent, so chunked
            # merging is semantics-preserving.
            F = gather_chunk
            pad_to = ((EM + F - 1) // F) * F
            order = jnp.argsort(jnp.where(fresh, 0, 1), axis=1, stable=True)
            c_ids = jnp.take_along_axis(nbrs, order, axis=1)
            c_fresh = jnp.take_along_axis(fresh, order, axis=1)
            if pad_to != EM:
                c_ids = jnp.concatenate(
                    [c_ids, jnp.full((B, pad_to - EM), BIG, jnp.int32)],
                    axis=1)
                c_fresh = jnp.concatenate(
                    [c_fresh, jnp.zeros((B, pad_to - EM), bool)], axis=1)
            max_fresh = jnp.max(jnp.sum(fresh, axis=1))
            b_rows_c = jax.lax.broadcasted_iota(jnp.int32, (B, F), 0)

            def inner_cond(st):
                return st[4] * F < max_fresh

            def inner_body(st):
                cd, ci, ce, vis, c = st
                ids_c = jax.lax.dynamic_slice_in_dim(c_ids, c * F, F, axis=1)
                mk_c = jax.lax.dynamic_slice_in_dim(
                    c_fresh.astype(jnp.int32), c * F, F, axis=1).astype(bool)
                safe_c = jnp.clip(ids_c, 0, N - 1)
                if not (dedup or visited_dense):
                    # bit-set rides in the chunk: the scatter touches only
                    # ~n_fresh elements instead of all E*Mx scanned ones
                    bits_c = (jnp.uint32(1)
                              << (safe_c % 32).astype(jnp.uint32))
                    vis = vis.at[b_rows_c, safe_c // 32].add(
                        jnp.where(mk_c, bits_c, jnp.uint32(0)))
                v = base[safe_c]
                dd = batched_scores(queries, v, metric)
                dd = jnp.where(mk_c, dd, jnp.inf)
                ii2 = jnp.where(mk_c, ids_c, BIG)
                cd, ci, ce = cap(*merge(cd, ci, ce, dd, ii2, L))
                return cd, ci, ce, vis, c + 1

            cand_d, cand_i, cand_e, visited, _ = jax.lax.while_loop(
                inner_cond, inner_body,
                (cand_d, cand_i, cand_e, visited, jnp.int32(0)))
        else:
            vecs = base[n_safe]                              # [B, EM, D]
            d = batched_scores(queries, vecs, metric)
            d = jnp.where(fresh, d, jnp.inf)
            ii = jnp.where(fresh, nbrs, BIG)
            cand_d, cand_i, cand_e = cap(*merge(
                cand_d, cand_i, cand_e, d, ii, L))
        cmps = cmps + jnp.sum(fresh, axis=1).astype(jnp.int32)
        if capture:
            # record the E expanded frontiers in expansion order; slots past
            # R fall off via drop-mode (capture is bounded at R, DESIGN.md)
            e_iota = jax.lax.broadcasted_iota(jnp.int32, (B, E), 1)
            raw_slot = hops[:, None] + e_iota
            okc = picked & (raw_slot < R)
            slot = jnp.where(okc, raw_slot, R)
            ret_i = ret_i.at[b_e, slot].set(
                jnp.where(okc, frontier, BIG), mode="drop")
            ret_d = ret_d.at[b_e, slot].set(
                jnp.where(okc, frontier_d, jnp.inf), mode="drop")
        hops = hops + jnp.sum(picked, axis=1).astype(jnp.int32)
        return (cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d,
                it + 1)

    return cond, body


def _init_state(base, queries, ep, *, L, metric, N, R, init_ids=None,
                init_dists=None, L_eff=None, track_visited=True):
    B = queries.shape[0]
    W = (N + 31) // 32 if track_visited else 1
    ep_vec = base[ep][None, :]
    ep_d = pointwise_scores(jnp.broadcast_to(ep_vec, queries.shape), queries,
                            metric)
    visited = jnp.zeros((B, W), jnp.uint32)
    if init_ids is None:
        cand_d = jnp.full((B, L), jnp.inf, jnp.float32).at[:, 0].set(ep_d)
        cand_i = jnp.full((B, L), BIG, jnp.int32).at[:, 0].set(ep)
        if track_visited:
            ep_word = ep // 32
            ep_bit = jnp.uint32(1) << jnp.uint32(ep % 32)
            visited = visited.at[:, ep_word].set(ep_bit)
        cmps = jnp.ones((B,), jnp.int32)  # the ep distance (``:2340``)
    else:
        # entry point + per-query seed candidates, id-deduplicated so the
        # visited add-scatter stays single-writer per bit
        S = init_ids.shape[1]
        all_i = jnp.concatenate(
            [jnp.full((B, 1), ep, jnp.int32), init_ids], axis=1)
        all_d = jnp.concatenate([ep_d[:, None], init_dists], axis=1)
        si, sd = jax.lax.sort((all_i, all_d), num_keys=1)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), si[:, 1:] == si[:, :-1]], axis=1)
        # sentinel/invalid seed ids (BIG from an underfull quantizer shard)
        # must not touch the bitmask: clipping them to N-1 would both mark a
        # real node visited and double-scatter its bit
        dup = dup | (si < 0) | (si >= N)
        safe = jnp.clip(si, 0, N - 1)
        bits = jnp.where(dup, jnp.uint32(0),
                         jnp.uint32(1) << (safe % 32).astype(jnp.uint32))
        if track_visited:
            b_r = jax.lax.broadcasted_iota(jnp.int32, (B, S + 1), 0)
            visited = visited.at[b_r, safe // 32].add(bits)
        si = jnp.where(dup, BIG, si)
        sd = jnp.where(dup, jnp.inf, sd)
        pad = max(L - (S + 1), 0)
        cand_d = jnp.concatenate(
            [sd, jnp.full((B, pad), jnp.inf)], axis=1)[:, :L]
        cand_i = jnp.concatenate(
            [si, jnp.full((B, pad), BIG, jnp.int32)], axis=1)[:, :L]
        cand_d, cand_i = jax.lax.sort((cand_d, cand_i), num_keys=2)
        cmps = jnp.full((B,), S + 1, jnp.int32)
    if L_eff is not None:
        live = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < L_eff
        cand_d = jnp.where(live, cand_d, jnp.inf)
        cand_i = jnp.where(live, cand_i, BIG)
    cand_e = jnp.zeros((B, L), jnp.int32)
    hops = jnp.zeros((B,), jnp.int32)
    ret_i = jnp.full((B, R), -1, jnp.int32)
    ret_d = jnp.full((B, R), jnp.inf, jnp.float32)
    return (cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d,
            jnp.int32(0))


# ---------------------------------------------------------------------------
# Plain engine: one jit call runs a batch to completion
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("k", "L", "metric", "max_hops", "capture", "exclude_self",
                     "gather_chunk", "expand_width", "visited_dense",
                     "visited_mode"),
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
    gather_chunk: int = 32,  # fresh-neighbor gather chunk (perf knob; 0 = off)
    expand_width: int = 1,   # frontier nodes expanded per step. 1 = strict
                             # best-first (reference parity). >1 trades exact
                             # expansion order for ~E x fewer loop steps;
                             # recall at a given L is unchanged or better but
                             # cmps/hops diverge from the reference accounting.
    init_ids: jnp.ndarray | None = None,    # [B, S] extra start candidates
    init_dists: jnp.ndarray | None = None,  # [B, S] their scores
    L_eff: jnp.ndarray | None = None,       # dynamic queue capacity <= L:
                                            # one compile serves a whole
                                            # L_pq sweep (L is the padded
                                            # static width)
    visited_dense: bool | None = None,      # None = auto by bitmask width
    visited_mode: str = "bitmask",          # "dedup": no visited state, dup
                                            # collapse in the merge (same
                                            # results, cmps counts re-scores)
) -> SearchResult:
    N, _ = adj.shape
    B = queries.shape[0]
    if self_ids is None:
        self_ids = jnp.full((B,), -1, jnp.int32)
    R = max(capture, 1)

    cond, body = _make_hop(adj, base, queries, self_ids, L=L, metric=metric,
                           capture=capture, R=R, exclude_self=exclude_self,
                           gather_chunk=gather_chunk,
                           expand_width=expand_width, L_eff=L_eff,
                           visited_dense=visited_dense,
                           visited_mode=visited_mode)
    state = _init_state(base, queries, ep, L=L, metric=metric, N=N, R=R,
                        init_ids=init_ids, init_dists=init_dists,
                        L_eff=L_eff,
                        track_visited=visited_mode != "dedup")

    def cond_max(st):
        return cond(st) & (st[8] < max_hops)

    state = jax.lax.while_loop(cond_max, body, state)
    cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, _ = state

    out_i = jnp.where(cand_i[:, :k] == BIG, -1, cand_i[:, :k])
    out_d = cand_d[:, :k]
    if capture:
        return SearchResult(out_i, out_d, cmps, hops, ret_i, ret_d)
    return SearchResult(out_i, out_d, cmps, hops)


# ---------------------------------------------------------------------------
# Segmented engine: bounded-hop segments + on-device survivor compaction
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("L", "metric", "segment", "gather_chunk", "expand_width",
                     "visited_mode"))
def _run_segment(adj, base, queries, orig_idx, state, *, L, metric, segment,
                 gather_chunk, expand_width, visited_mode="bitmask"):
    """Advance every query by at most ``segment`` further frontier
    expansions. Returns (state, n_active)."""
    B = queries.shape[0]
    self_ids = jnp.full((B,), -1, jnp.int32)
    cond, body = _make_hop(adj, base, queries, self_ids, L=L, metric=metric,
                           capture=0, R=1, exclude_self=False,
                           gather_chunk=gather_chunk,
                           expand_width=expand_width,
                           visited_mode=visited_mode)
    state = state[:8] + (jnp.int32(0),)  # reset segment iteration counter

    def cond_seg(st):
        return cond(st) & (st[8] < segment)

    state = jax.lax.while_loop(cond_seg, body, state)
    cand_i, cand_e = state[1], state[2]
    active = jnp.any((cand_e == 0) & (cand_i != BIG), axis=1)
    return state, jnp.sum(active.astype(jnp.int32)), active


@functools.partial(jax.jit, static_argnames=("out_size",))
def _compact(queries, orig_idx, state, active, *, out_size):
    """Gather the first ``out_size`` still-active rows (padding with
    finished rows, which idle as no-ops) into a smaller batch."""
    order = jnp.argsort(jnp.where(active, 0, 1), axis=0, stable=True)
    sel = order[:out_size]
    cand_d, cand_i, cand_e, visited, cmps, hops, ret_i, ret_d, it = state
    new_state = (cand_d[sel], cand_i[sel], cand_e[sel], visited[sel],
                 cmps[sel], hops[sel], ret_i[sel], ret_d[sel], it)
    return queries[sel], orig_idx[sel], new_state


def search_segmented(
    graph: PaddedGraph, base, queries, config: SearchConfig, *,
    segment: int | None = None, seeds=None,
):
    """Serving-path search with straggler elimination.

    Runs ``segment``-hop slices; after each slice, finished queries' results
    are written out and the surviving queries are compacted on device into
    the next power-of-two batch size. Device work tracks the *sum* of
    per-query hops instead of ``batch x max`` (the reference's OpenMP
    dynamic schedule achieves the same effect with work stealing,
    ``tests/test_search_roargraph.cpp:203``).

    ``seeds`` (a :class:`~roargraph_tpu.ops.seeds.SeedIndex`) adds per-query
    quantizer starts exactly as in the plain engine — large-N serving wants
    seeded *and* segmented together.
    """
    adj = jnp.asarray(graph.ids)
    base_dev = jnp.asarray(base)
    queries = np.asarray(queries)
    Q = queries.shape[0]
    k, L = config.k, config.L_pq
    segment = segment or max(L, 32)
    Bsz = min(config.batch_size, max(64, Q))
    ep = jnp.int32(graph.ep)

    seed_fn = None
    if seeds is not None and config.n_seeds > 0:
        from .ops.seeds import seed_queries
        sid = jnp.asarray(seeds.seed_ids)
        svec = jnp.asarray(seeds.seed_vecs)

        def seed_fn(qb):
            return seed_queries(qb, sid, svec, n_seeds=config.n_seeds,
                                metric=config.metric)

    out_ids = np.empty((Q, k), np.int32)
    out_d = np.empty((Q, k), np.float32)
    out_cmps = np.empty((Q,), np.int32)
    out_hops = np.empty((Q,), np.int32)

    def finalize(state, q_idx, mask):
        cand_d, cand_i, _, _, cmps, hops, *_ = state
        sel = np.asarray(mask)
        if not sel.any():
            return
        rows = np.asarray(q_idx)[sel]
        keep = rows >= 0  # padded rows carry orig_idx -1
        rows = rows[keep]
        ids = np.asarray(cand_i[:, :k])[sel][keep]
        out_ids[rows] = np.where(ids == int(BIG), -1, ids)
        out_d[rows] = np.asarray(cand_d[:, :k])[sel][keep]
        out_cmps[rows] = np.asarray(cmps)[sel][keep]
        out_hops[rows] = np.asarray(hops)[sel][keep]

    max_rounds = (config.effective_max_hops + segment - 1) // segment
    for s in range(0, Q, Bsz):
        e = min(s + Bsz, Q)
        qb = queries[s:e]
        orig = np.arange(s, e, dtype=np.int32)
        if e - s < Bsz:
            pad = Bsz - (e - s)
            qb = np.concatenate([qb, np.zeros((pad, qb.shape[1]), qb.dtype)])
            orig = np.concatenate([orig, np.full(pad, -1, np.int32)])
        qd = jnp.asarray(qb)
        oi = jnp.asarray(orig)
        init_ids = init_dists = None
        if seed_fn is not None:
            init_ids, init_dists = seed_fn(qd)
        state = _init_state(base_dev, qd, ep, L=L, metric=config.metric,
                            N=adj.shape[0], R=1, init_ids=init_ids,
                            init_dists=init_dists,
                            track_visited=config.visited_mode != "dedup")
        for _ in range(max_rounds):
            state, n_active, active = _run_segment(
                adj, base_dev, qd, oi, state, L=L, metric=config.metric,
                segment=segment, gather_chunk=config.gather_chunk,
                expand_width=config.expand_width,
                visited_mode=config.visited_mode)
            n = int(n_active)
            B_cur = qd.shape[0]
            if n == 0:
                finalize(state, oi, np.ones(B_cur, bool))
                break
            # retire finished rows, shrink the batch when <= half survive
            target = B_cur
            while target > 64 and n <= target // 2:
                target //= 2
            if target < B_cur:
                finalize(state, oi, ~np.asarray(active))
                qd, oi, state = _compact(qd, oi, state, active,
                                         out_size=target)
        else:
            finalize(state, oi, np.ones(qd.shape[0], bool))
    if config.check_min_results and (out_ids < 0).any():
        short = int((out_ids < 0).any(axis=1).sum())
        raise RuntimeError(
            f"not enough results for {short} queries, expected: {config.k}")
    return out_ids, out_d, out_cmps, out_hops


# ---------------------------------------------------------------------------
# Host-facing convenience wrapper
# ---------------------------------------------------------------------------

def search(
    graph: PaddedGraph,
    base,
    queries,
    config: SearchConfig,
    seeds=None,  # ops.seeds.SeedIndex | None
):
    """Search a batch of queries, looping device-sized blocks on the host.

    Returns numpy (ids [Q, k], dists [Q, k], cmps [Q], hops [Q])."""
    if config.segmented:
        return search_segmented(graph, base, queries, config,
                                segment=config.segment_hops, seeds=seeds)
    adj = jnp.asarray(graph.ids)
    base_dev = jnp.asarray(base)
    # device-resident: a jnp query array is sliced on device, not re-uploaded
    queries = jnp.asarray(queries)
    Q = queries.shape[0]
    Bsz = min(config.batch_size, Q) if Q else config.batch_size
    ep = jnp.int32(graph.ep)

    seed_fn = None
    if seeds is not None and config.n_seeds > 0:
        from .ops.seeds import seed_queries
        sid = jnp.asarray(seeds.seed_ids)
        svec = jnp.asarray(seeds.seed_vecs)

        def seed_fn(qb):
            return seed_queries(qb, sid, svec, n_seeds=config.n_seeds,
                                metric=config.metric)

    ids = np.empty((Q, config.k), np.int32)
    dists = np.empty((Q, config.k), np.float32)
    cmps = np.empty((Q,), np.int32)
    hops = np.empty((Q,), np.int32)
    # Dispatch every batch asynchronously before materializing any result —
    # device round-trip latency then overlaps with compute instead of
    # serializing per batch.
    pending = []
    for s in range(0, Q, Bsz):
        e = min(s + Bsz, Q)
        qb = queries[s:e]
        if e - s < Bsz:
            qb = jnp.pad(qb, ((0, Bsz - (e - s)), (0, 0)))
        qd = qb
        init_ids = init_dists = None
        if seed_fn is not None:
            init_ids, init_dists = seed_fn(qd)
        if config.L_bucket is not None:
            L_static, L_eff = config.L_bucket, jnp.int32(config.L_pq)
        else:
            L_static, L_eff = config.L_pq, None
        res = beam_search_batch(
            adj, base_dev, qd, ep,
            k=config.k, L=L_static, metric=config.metric,
            max_hops=config.effective_max_hops,
            gather_chunk=config.gather_chunk,
            expand_width=config.expand_width,
            init_ids=init_ids, init_dists=init_dists, L_eff=L_eff,
            visited_mode=config.visited_mode)
        pending.append((s, e, pack_results(res.ids, res.dists,
                                           res.cmps, res.hops)))
    for s, e, res in pending:
        bi, bd, bc, bh = unpack_results(np.asarray(res)[: e - s], config.k)
        ids[s:e], dists[s:e], cmps[s:e], hops[s:e] = bi, bd, bc, bh
    if config.check_min_results and (ids < 0).any():
        short = int((ids < 0).any(axis=1).sum())
        raise RuntimeError(
            f"not enough results for {short} queries, expected: {config.k}")
    return ids, dists, cmps, hops
