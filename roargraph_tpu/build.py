"""RoarGraph index construction, reformulated for TPU.

Reference pipeline (``BuildRoarGraph``, ``src/index_bipartite.cpp:143-233`` →
``LinkProjection:1043-1277``):

  Phase A  per training query: occlusion-prune its NN list into the head
           neighbor's out-edges; insert reverse edges under per-node locks,
           re-pruning nodes that overflow ``M_pjbp``.
  Phase B  per base node: beam-search the (copied) graph, occlusion-prune the
           expanded set into a "supply" out-list, reverse-insert with bound
           ``2*M_pjbp``, re-prune overflows, then merge up to ``2*M_pjbp``
           novel supply edges back into the projection graph.

TPU reformulation (SURVEY.md §7.1): every mutation-under-lock becomes a
deterministic bulk round — a ``vmap``-style batched kernel over nodes plus a
host-side scatter/group-by. Phase A pruning is a pure function of each query's
own NN list, so it vectorizes directly; reverse-edge insertion becomes a
global edge-flip + segmented group-by + one batched re-prune of overflowing
nodes; Phase B reuses the lockstep search engine *incrementally* in
bulk-synchronous batches (each batch's new edges are visible to later
batches' searches — the deterministic analog of the reference's in-place
racy updates, which are what stitch phase-A fragments into one searchable
component).

Known, deliberate divergences from the reference (all order-level, none
semantic — parity is judged on the recall/QPS curve, SURVEY.md §7.4):

- reverse-edge arrival order is deterministic — source-id-ascending in
  phase A, (destination, distance, source)-ascending in phase B — instead
  of thread-racing;
- a node overflowing during reverse insertion is re-pruned once per bulk
  round over the candidate union instead of once per arriving edge: phase A
  prunes the full union; phase B appends closest-first to the ``2*M`` bound
  and occlusion-re-prunes up to B overflowing destinations per batch over
  (current row ∪ M closest dropped arrivals) — the batched analog of
  ``SupplyAddReverse``'s per-event re-prune;
- phase-B incrementality is batch-granular instead of per-node, with a
  geometric batch-size ramp (:func:`phase_b_schedule`) so the early,
  connectivity-critical nodes get near-per-node granularity;
- the phase-B expanded-set capture is bounded at ``L_pjpq`` entries.
"""
from __future__ import annotations

import dataclasses
import os
import time

import jax.numpy as jnp
import numpy as np

from .config import BuildConfig, Metric
from .graph import PAD, PaddedGraph
from .ops.distance import batched_scores, pairwise_scores
from .ops.prune import occlusion_prune
from .search import beam_search_batch

import functools
import jax


@functools.partial(jax.jit, static_argnames=())
def _medoid(base: jnp.ndarray) -> jnp.ndarray:
    """Entry point: the base point closest (L2) to the centroid — parity with
    ``CalculateProjectionep`` (``src/index_bipartite.cpp:2004-2041``), which
    uses plain L2 regardless of the build metric."""
    center = jnp.mean(base.astype(jnp.float32), axis=0, keepdims=True)
    d = pairwise_scores(center, base, Metric.L2)[0]
    return jnp.argmin(d).astype(jnp.int32)


def compute_medoid(base) -> int:
    return int(_medoid(jnp.asarray(base)))


@dataclasses.dataclass
class BuildReport:
    """Build-time breakdown, matching the reference's printed phases
    (projection time / connectivity time, ``src/index_bipartite.cpp:1156,1276``)."""
    projection_s: float = 0.0
    connectivity_s: float = 0.0
    total_s: float = 0.0
    stats: dict = dataclasses.field(default_factory=dict)


# ---------------------------------------------------------------------------
# Host-side helpers (deterministic group-by; no heavy math here)
# ---------------------------------------------------------------------------

def _group_ranks(sorted_keys: np.ndarray) -> np.ndarray:
    """rank of each element within its (contiguous) key group."""
    n = sorted_keys.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    is_first = np.empty(n, bool)
    is_first[0] = True
    is_first[1:] = sorted_keys[1:] != sorted_keys[:-1]
    idx = np.arange(n)
    first_idx = np.where(is_first, idx, 0)
    first_idx = np.maximum.accumulate(first_idx)
    return idx - first_idx


def _prune_rows_device(cand_ids, cand_dists, cand_valid, node_ids, base_dev,
                       *, metric, M, backfill, defer_mask=None, batch=1024):
    """Run the batched occlusion prune over host arrays, in device batches.

    Returns (ids [R, M], dists [R, M]) numpy."""
    R, C = cand_ids.shape
    out_i = np.full((R, M), PAD, np.int32)
    out_d = np.full((R, M), np.inf, np.float32)
    use_defer = defer_mask is not None
    for s in range(0, R, batch):
        e = min(s + batch, R)
        pad = batch - (e - s) if (e - s) < batch and R > batch else 0
        sl = slice(s, e)

        def _pad(a, fill):
            if not pad:
                return a[sl]
            return np.concatenate(
                [a[sl], np.full((pad,) + a.shape[1:], fill, a.dtype)])

        ids_b = _pad(cand_ids, -1)
        d_b = _pad(cand_dists, np.inf)
        v_b = _pad(cand_valid, False)
        n_b = _pad(node_ids, 0)
        dm = None
        if use_defer:
            dm = jnp.asarray(_pad(defer_mask, False))
        ri, rd = occlusion_prune(
            jnp.asarray(ids_b), jnp.asarray(d_b), jnp.asarray(v_b),
            base_dev[jnp.asarray(n_b)], base_dev,
            metric=metric, M=M, backfill=backfill,
            defer_mask=dm, use_defer=use_defer)
        out_i[sl] = np.asarray(ri)[: e - s]
        out_d[sl] = np.asarray(rd)[: e - s]
    return out_i, out_d


def _reverse_round(ids: np.ndarray, dists: np.ndarray, base_dev, *,
                   metric: Metric, cap: int, prune_M: int,
                   prune_backfill: bool, out_width: int,
                   batch: int = 1024):
    """One bulk reverse-edge insertion round.

    Semantics per destination node v (parity with ``ProjectionAddReverse``
    ``src/index_bipartite.cpp:1391-1432`` / ``SupplyAddReverse:1352-1389``):
    collect reverse sources {u : v in adj[u]} not already in adj[v]; if
    deg(v) + |new| <= cap, append them; otherwise occlusion-re-prune the whole
    union down to ``prune_M``  (``PruneProjectionReverseCandidates:1527-1610``
    with backfill / ``PruneProjectionInternalReverseCandidates:1434-1525``
    without). Distances ride along (symmetric metrics), so no recomputation.
    """
    N, W = ids.shape
    valid = ids != PAD
    deg = valid.sum(axis=1).astype(np.int64)

    src = np.repeat(np.arange(N, dtype=np.int64), W)[valid.ravel()]
    dst = ids.ravel()[valid.ravel()].astype(np.int64)
    d = dists.ravel()[valid.ravel()]

    # Drop reverse candidates (dst -> src) that already exist as edges:
    # row-membership test src ∈ ids[dst], chunked — no composite edge-key
    # materialization (the old int64-key isin needed ~3 GB at 10M x 35).
    present = np.zeros(src.size, bool)
    CH = max(1, 2**22)
    for s_ in range(0, src.size, CH):
        e_ = min(s_ + CH, src.size)
        present[s_:e_] = (
            ids[dst[s_:e_]] == src[s_:e_, None].astype(np.int32)).any(axis=1)
    src, dst, d = src[~present], dst[~present], d[~present]

    # Deterministic arrival order: (dst, src) ascending.
    order = np.lexsort((src, dst))
    sdst, ssrc, sd = dst[order], src[order], d[order]
    # A (u, v) pair can appear at most once (rows are duplicate-free), so
    # groups need no intra-dedup.
    rank = _group_ranks(sdst)
    counts = np.bincount(sdst, minlength=N)

    total = deg + counts
    fits = total <= cap

    out_i = np.full((N, out_width), PAD, np.int32)
    out_d = np.full((N, out_width), np.inf, np.float32)
    out_i[:, :W] = ids
    out_d[:, :W] = dists

    # Nodes that fit: append in arrival order after existing entries.
    app = fits[sdst]
    pos = deg[sdst] + rank
    ok = app & (pos < out_width)
    out_i[sdst[ok], pos[ok]] = ssrc[ok].astype(np.int32)
    out_d[sdst[ok], pos[ok]] = sd[ok]

    # Overflowing nodes: one batched re-prune over old + new candidates.
    over = np.flatnonzero(~fits)
    if over.size:
        max_new = 3 * cap  # closest-first truncation of huge reverse fan-in
        C = W + max_new
        n_o = over.size
        cand_i = np.full((n_o, C), -1, np.int32)
        cand_d = np.full((n_o, C), np.inf, np.float32)
        cand_i[:, :W] = ids[over]
        cand_d[:, :W] = dists[over]

        # order new candidates per overflow node by (distance, src) and take
        # the closest max_new
        o_mask = ~fits[sdst]
        o_dst, o_src, o_d = sdst[o_mask], ssrc[o_mask], sd[o_mask]
        o_order = np.lexsort((o_src, o_d, o_dst))
        o_dst, o_src, o_d = o_dst[o_order], o_src[o_order], o_d[o_order]
        o_rank = _group_ranks(o_dst)
        keepn = o_rank < max_new
        o_dst, o_src, o_d, o_rank = (o_dst[keepn], o_src[keepn], o_d[keepn],
                                     o_rank[keepn])
        row_of = np.full(N, -1, np.int64)
        row_of[over] = np.arange(n_o)
        r = row_of[o_dst]
        cand_i[r, W + o_rank] = o_src.astype(np.int32)
        cand_d[r, W + o_rank] = o_d

        pi, pd = _prune_rows_device(
            cand_i, cand_d, cand_i >= 0, over.astype(np.int32), base_dev,
            metric=metric, M=prune_M, backfill=prune_backfill, batch=batch)
        out_i[over] = PAD
        out_d[over] = np.inf
        out_i[over, :prune_M] = pi
        out_d[over, :prune_M] = pd
    return out_i, out_d


# ---------------------------------------------------------------------------
# Phase A — projection from the query-base bipartite graph
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("metric", "M", "M_sq", "chunk"))
def _phase_a_core(train_knn, base_dev, *, metric, M, M_sq, chunk):
    """Device core of phase A: per training query, distances of its NN tail
    to its head NN plus the occlusion prune — chunked via ``lax.map`` so the
    gathered candidate vectors never exceed one chunk's footprint.

    ``train_knn`` rows must be padded to a multiple of ``chunk`` (pad rows:
    head -1, ignored by the caller). Returns (tgt [Nq], ids [Nq, M],
    dists [Nq, M])."""
    Nq = train_knn.shape[0]
    N = base_dev.shape[0]
    knn = train_knn[:, :M_sq].astype(jnp.int32)
    tgt = knn[:, 0]
    cand = knn[:, 1:]
    valid = (cand != tgt[:, None]) & (cand >= 0)
    # GT rows are unique by construction; enforce anyway (first occurrence
    # wins) to protect the visited-bitmask invariant downstream.
    sort_idx = jnp.argsort(cand, axis=1, stable=True)
    sorted_c = jnp.take_along_axis(cand, sort_idx, axis=1)
    dup_sorted = jnp.concatenate(
        [jnp.zeros((Nq, 1), bool), sorted_c[:, 1:] == sorted_c[:, :-1]],
        axis=1)
    dup = jnp.take_along_axis(dup_sorted, jnp.argsort(sort_idx, axis=1),
                              axis=1)
    valid = valid & ~dup

    C = cand.shape[1]
    G = Nq // chunk

    def one(args):
        tg, cd, va = args
        tgt_vec = base_dev[jnp.clip(tg, 0, N - 1)]
        cvecs = base_dev[jnp.clip(cd, 0, N - 1)]
        dists = batched_scores(tgt_vec, cvecs, metric)
        return occlusion_prune(cd, dists, va, tgt_vec, base_dev,
                               metric=metric, M=M, backfill=True)

    pi, pd = jax.lax.map(one, (tgt.reshape(G, chunk),
                               cand.reshape(G, chunk, C),
                               valid.reshape(G, chunk, C)))
    return tgt, pi.reshape(Nq, M), pd.reshape(Nq, M)


def _phase_a(base_dev, train_knn: np.ndarray, cfg: BuildConfig, N: int):
    """Per training query: head NN becomes the target node; the remaining NNs
    are occlusion-pruned into its out-list (``LinkProjection`` phase A,
    ``src/index_bipartite.cpp:1059-1097``). Pure per-query → fully batched
    on device (:func:`_phase_a_core`); only the final out-list scatter runs
    on the host.

    Target collisions (several queries sharing a head NN) resolve
    last-query-wins, a deterministic stand-in for the reference's
    thread-racing overwrite of ``projection_graph_[tgt]`` (``:1088-1091``)."""
    Nq = train_knn.shape[0]
    M_sq = min(cfg.M_sq, train_knn.shape[1])
    knn = np.asarray(train_knn)[:, :M_sq].astype(np.int64)
    chunk = min(cfg.prune_batch, max(Nq, 1))
    # Host-chunked dispatches (a bounded lax.map inside each) instead of one
    # whole-Nq device program: same math, but progress is observable and a
    # single giant dispatch can't wedge a long build at large Nq.
    super_chunk = chunk * 16
    pruned_i = np.empty((Nq, cfg.M_pjbp), np.int32)
    pruned_d = np.empty((Nq, cfg.M_pjbp), np.float32)
    for s in range(0, Nq, super_chunk):
        e = min(s + super_chunk, Nq)
        blk = knn[s:e].astype(np.int32)
        pad = (-(e - s)) % chunk
        if pad:
            blk = np.concatenate(
                [blk, np.full((pad, M_sq), -1, np.int32)])
        _, pi, pd = _phase_a_core(
            jnp.asarray(blk), base_dev, metric=cfg.metric, M=cfg.M_pjbp,
            M_sq=M_sq, chunk=chunk)
        pruned_i[s:e] = np.asarray(pi)[: e - s]
        pruned_d[s:e] = np.asarray(pd)[: e - s]
        if Nq > super_chunk:
            import sys
            print(f"phase A: {e}/{Nq}", flush=True, file=sys.stderr)
    tgt = knn[:, 0]

    # scatter out-lists; duplicate targets: last query index wins
    adj_i = np.full((N, cfg.M_pjbp), PAD, np.int32)
    adj_d = np.full((N, cfg.M_pjbp), np.inf, np.float32)
    adj_i[tgt] = pruned_i
    adj_d[tgt] = pruned_d
    return adj_i, adj_d


# ---------------------------------------------------------------------------
# Phase B — connectivity augmentation
# ---------------------------------------------------------------------------

def _pb_prune_body(ret_i, ret_d, nodes, nodes_ok, proj_i_dev, base_dev, *,
                   metric, M, prune_chunk=0):
    """Phase-B part 1: defer-mask + occlusion prune of each node's captured
    expanded set down to its new ``M``-wide out-list."""
    N = proj_i_dev.shape[0]
    B, R = ret_i.shape
    valid = (ret_i >= 0) & (ret_i != nodes[:, None]) & nodes_ok[:, None]
    # defer candidates already present in the node's projection list
    # (the reference's first-element skip, ``:1858-1865``)
    proj_rows = proj_i_dev[jnp.clip(nodes, 0, N - 1)]        # [B, Mp]
    defer = valid & jnp.any(
        ret_i[:, :, None] == proj_rows[:, None, :], axis=2)
    node_vecs = base_dev[jnp.clip(nodes, 0, N - 1)]

    if prune_chunk and prune_chunk < B:
        G = B // prune_chunk

        def one(args):
            ri, rd, va, nv, dm = args
            return occlusion_prune(ri, rd, va, nv, base_dev, metric=metric,
                                   M=M, backfill=False, defer_mask=dm,
                                   use_defer=True)
        pi, pd = jax.lax.map(one, (
            ret_i.reshape(G, prune_chunk, R),
            ret_d.reshape(G, prune_chunk, R),
            valid.reshape(G, prune_chunk, R),
            node_vecs.reshape(G, prune_chunk, -1),
            defer.reshape(G, prune_chunk, R)))
        pi, pd = pi.reshape(B, M), pd.reshape(B, M)
    else:
        pi, pd = occlusion_prune(ret_i, ret_d, valid, node_vecs, base_dev,
                                 metric=metric, M=M, backfill=False,
                                 defer_mask=defer, use_defer=True)
    return pi, pd


def _pb_write_reverse_body(supply_i, supply_d, deg, pi, pd, nodes, nodes_ok,
                           *, M, W):
    """Phase-B part 2: write the batch's new out-lists, then the
    deterministic reverse-append bounded at ``W``. Returns the updated
    supply state plus the sorted reverse-edge stream consumed by part 3."""
    N = supply_i.shape[0]
    B = pi.shape[0]
    BIGI = jnp.int32(2**31 - 1)

    # --- write the batch's new out-lists (padding rows drop) -----------
    row_i = jnp.full((B, W), PAD, jnp.int32).at[:, :M].set(pi)
    row_d = jnp.full((B, W), jnp.inf, jnp.float32).at[:, :M].set(pd)
    tgt = jnp.where(nodes_ok, nodes, N)
    supply_i = supply_i.at[tgt].set(row_i, mode="drop")
    supply_d = supply_d.at[tgt].set(row_d, mode="drop")
    deg = deg.at[tgt].set(jnp.sum(pi != PAD, axis=1).astype(deg.dtype),
                          mode="drop")

    # --- reverse appends (u -> v gives v -> u), bound W ----------------
    src = jnp.repeat(nodes, M)                               # [B*M]
    dst = pi.reshape(-1)
    dval = pd.reshape(-1)
    ok = (dst >= 0) & jnp.repeat(nodes_ok, M)
    dst_l = jnp.where(ok, dst, BIGI)
    # skip pairs already present in the destination rows
    rows = supply_i[jnp.clip(dst_l, 0, N - 1)]               # [B*M, W]
    already = jnp.any(rows == src[:, None], axis=1)
    dst_l = jnp.where(already, BIGI, dst_l)
    # deterministic arrival order: (dst, dist, src) ascending — closest
    # arrivals win the free slots (invalid sort last)
    sdst, sd, ssrc = jax.lax.sort((dst_l, dval, src), num_keys=3)
    E = sdst.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sdst[1:] != sdst[:-1]])
    first_idx = jax.lax.cummax(jnp.where(is_first, idx, 0))
    rank = idx - first_idx
    deg_d = deg[jnp.clip(sdst, 0, N - 1)].astype(jnp.int32)
    avail = jnp.maximum(W - deg_d, 0)
    accepted = (sdst < BIGI) & (rank < avail)
    tgt2 = jnp.where(accepted, sdst, N)
    pos = jnp.where(accepted, deg_d + rank, 0)
    supply_i = supply_i.at[tgt2, pos].set(ssrc.astype(jnp.int32),
                                          mode="drop")
    supply_d = supply_d.at[tgt2, pos].set(sd, mode="drop")
    deg = deg.at[tgt2].add(accepted.astype(deg.dtype), mode="drop")
    return supply_i, supply_d, deg, sdst, sd, ssrc, rank, avail


def _pb_overflow_body(supply_i, supply_d, deg, sdst, sd, ssrc, rank, avail,
                      base_dev, *, metric, M, W):
    """Phase-B part 3: overflow absorb + re-prune
    (``SupplyAddReverse:1362-1387``). A destination whose reverse fan-in
    exceeds its free slots is NOT allowed to drop the overflow: the
    reference occlusion-re-prunes the neighbor union down to M, making room
    for closer arrivals (dropping instead measurably costs graph quality —
    see test_crossval_cpp). Bulk analog: per batch, up to B overflowing
    destinations get their post-append row unioned with their A closest
    dropped arrivals and re-pruned to M in one batched occlusion pass."""
    N = supply_i.shape[0]
    BIGI = jnp.int32(2**31 - 1)
    E = sdst.shape[0]
    idx = jnp.arange(E, dtype=jnp.int32)
    P, A = E // M, M   # E = B*M
    marker = (sdst < BIGI) & (rank == avail)   # one edge per overflow dst
    m_idx = jnp.argsort(jnp.where(marker, idx, E + idx))[:P]
    m_valid = marker[m_idx]
    dst_p = jnp.where(m_valid, sdst[m_idx], N)               # [P]
    e_mat = m_idx[:, None] + jnp.arange(A, dtype=jnp.int32)  # [P, A]
    e_safe = jnp.clip(e_mat, 0, E - 1)
    ex_ok = (m_valid[:, None] & (e_mat < E) &
             (sdst[e_safe] == dst_p[:, None]))
    ex_src = jnp.where(ex_ok, ssrc[e_safe].astype(jnp.int32), PAD)
    ex_d = jnp.where(ex_ok, sd[e_safe], jnp.inf)

    dst_safe = jnp.clip(dst_p, 0, N - 1)
    row_i = supply_i[dst_safe]                               # [P, W]
    row_d = supply_d[dst_safe]
    cand_i = jnp.concatenate([row_i, ex_src], axis=1)        # [P, W+A]
    cand_d = jnp.concatenate([row_d, ex_d], axis=1)
    cand_v = (cand_i != PAD) & m_valid[:, None]
    pr_i, pr_d = occlusion_prune(
        cand_i, cand_d, cand_v, base_dev[dst_safe], base_dev,
        metric=metric, M=M, backfill=False)
    new_i = jnp.full((P, W), PAD, jnp.int32).at[:, :M].set(pr_i)
    new_d = jnp.full((P, W), jnp.inf, jnp.float32).at[:, :M].set(pr_d)
    tgt3 = jnp.where(m_valid, dst_p, N)
    supply_i = supply_i.at[tgt3].set(new_i, mode="drop")
    supply_d = supply_d.at[tgt3].set(new_d, mode="drop")
    deg = deg.at[tgt3].set(jnp.sum(pr_i != PAD, axis=1).astype(deg.dtype),
                           mode="drop")
    return supply_i, supply_d, deg


@functools.partial(
    jax.jit,
    static_argnames=("metric", "M", "W", "prune_chunk"),
    donate_argnums=(0, 1, 2))
def _phase_b_step(supply_i, supply_d, deg, ret_i, ret_d, nodes, nodes_ok,
                  proj_i_dev, base_dev, *, metric, M, W, prune_chunk=0):
    """One fused device step of phase B for a batch of nodes: defer-mask →
    occlusion prune → out-list write → deterministic reverse-append (bounded
    at ``W``) → overflow re-prune. No host math; the supply arrays stay
    device-resident across batches (donated buffers, updates in place).

    NOTE: the default execution path is :func:`_phase_b_step_split` — the
    identical computation as three smaller dispatches. This single fused
    program deterministically kills the TPU runtime at ramp widths >= 64
    on the axon backend (bisected round 4: the search and every split part
    run clean; only the fused whole faults, surfacing FAILED_PRECONDITION /
    INTERNAL at the next fetch). Kept for direct-attached devices via
    ROAR_PHASEB_FUSED=1."""
    pi, pd = _pb_prune_body(ret_i, ret_d, nodes, nodes_ok, proj_i_dev,
                            base_dev, metric=metric, M=M,
                            prune_chunk=prune_chunk)
    supply_i, supply_d, deg, sdst, sd, ssrc, rank, avail = \
        _pb_write_reverse_body(supply_i, supply_d, deg, pi, pd, nodes,
                               nodes_ok, M=M, W=W)
    return _pb_overflow_body(supply_i, supply_d, deg, sdst, sd, ssrc, rank,
                             avail, base_dev, metric=metric, M=M, W=W)


_pb_prune = functools.partial(
    jax.jit, static_argnames=("metric", "M", "prune_chunk"))(_pb_prune_body)
_pb_write_reverse = functools.partial(
    jax.jit, static_argnames=("M", "W"))(_pb_write_reverse_body)
_pb_overflow = functools.partial(
    jax.jit, static_argnames=("metric", "M", "W"))(_pb_overflow_body)


def _phase_b_step_split(supply_i, supply_d, deg, ret_i, ret_d, nodes,
                        nodes_ok, proj_i_dev, base_dev, *, metric, M, W,
                        prune_chunk=0):
    """The phase-B step as three sequential device programs (prune /
    write+reverse / overflow re-prune) — bit-identical to
    :func:`_phase_b_step` (same traced bodies, same order), but none of the
    three triggers the axon-backend fault the fused program hits. The
    intermediate arrays ([B, M] out-lists, [B*M] sorted edge stream) stay
    on device; the extra dispatches cost ~2 relay RTTs per batch, amortized
    to noise by the async run-ahead window."""
    pi, pd = _pb_prune(ret_i, ret_d, nodes, nodes_ok, proj_i_dev, base_dev,
                       metric=metric, M=M, prune_chunk=prune_chunk)
    supply_i, supply_d, deg, sdst, sd, ssrc, rank, avail = \
        _pb_write_reverse(supply_i, supply_d, deg, pi, pd, nodes, nodes_ok,
                          M=M, W=W)
    return _pb_overflow(supply_i, supply_d, deg, sdst, sd, ssrc, rank,
                        avail, base_dev, metric=metric, M=M, W=W)


def phase_b_schedule(N: int, B: int, *, ramp_from: int = 16):
    """Deterministic phase-B batch schedule: geometric ramp ``ramp_from``
    → ``B``, then fixed ``B``-node batches. Early batches are small because
    incrementality is front-loaded — the first nodes search a near-empty
    graph, and coarse batching there measurably costs final graph quality
    (test_crossval_cpp); once the supply graph is dense, per-batch staleness
    is negligible and full-width batches restore device efficiency. The
    ramp covers < 2*B nodes total, so large-N wall-clock is unchanged.

    Returns [(start_node, end_node, padded_width), ...]; shared by the
    sequential and SPMD builds so both walk identical batch boundaries."""
    sizes = []
    b = min(ramp_from, B)
    s = 0
    while s < N:
        e = min(s + b, N)
        sizes.append((s, e, b))
        s = e
        if b < B:
            b = min(b * 2, B)
    return sizes


def _phase_b_search_prune(adj_i, adj_d, base_dev, cfg: BuildConfig, ep: int,
                          proj_i: np.ndarray, checkpoint_dir: str | None = None,
                          checkpoint_secs: float = 300.0):
    """Per base node: beam-search the supply graph from the medoid, then
    occlusion-prune the expanded set into the node's new supply out-list
    (``SearchProjectionGraphInternal:1279-1350`` +
    ``PruneProjectionBaseSearchCandidates:1846-1940``). The prune defers
    candidates already present in the node's projection list from seeding the
    result (the reference's first-element skip, ``:1858-1865``).

    **Incrementality is load-bearing**: the reference updates ``supply_nbrs_``
    and inserts reverse edges *while* the parallel loop runs, so later nodes
    search a progressively better-connected graph — that is what stitches
    phase-A fragments into one searchable component. The TPU version keeps
    that property bulk-synchronously: nodes are processed in batches, and
    each batch's new out-lists plus reverse appends land in the
    device-resident adjacency before the next batch searches. Reverse inserts
    append up to the ``2*M_pjbp`` bound (``SupplyAddReverse:1353``); overflow
    re-pruning is deferred to the final degree-check pass
    (``LinkProjection:1224-1248``) instead of happening per arriving edge.

    The whole phase is two device calls per batch (search + fused
    prune/scatter step, :func:`_phase_b_step`); supply state never leaves the
    device except at checkpoints.
    """
    N = adj_i.shape[0]
    L = cfg.L_pjpq
    R = L  # bounded expanded-set capture
    B = cfg.search_batch
    M = cfg.M_pjbp
    W = 2 * M  # supply width bound

    supply_i = np.full((N, W), PAD, np.int32)
    supply_d = np.full((N, W), np.inf, np.float32)
    supply_i[:, : adj_i.shape[1]] = adj_i
    supply_d[:, : adj_d.shape[1]] = adj_d
    deg = (supply_i != PAD).sum(axis=1).astype(np.int32)

    start = 0
    ckpt = (os.path.join(checkpoint_dir, "phase_b.npz")
            if checkpoint_dir else None)
    if ckpt and os.path.exists(ckpt):
        with np.load(ckpt) as z:
            if z["supply_i"].shape == supply_i.shape:
                supply_i, supply_d = z["supply_i"], z["supply_d"]
                deg = z["deg"].astype(np.int32)
                start = int(z["next"])
                print(f"resuming phase B at node {start}/{N} from {ckpt}")
            else:
                import sys
                print(f"ignoring stale phase-B checkpoint {ckpt} (shape "
                      f"{z['supply_i'].shape} != {supply_i.shape})",
                      file=sys.stderr)

    supply_i_dev = jnp.asarray(supply_i)
    supply_d_dev = jnp.asarray(supply_d)
    deg_dev = jnp.asarray(deg)
    proj_i_dev = jnp.asarray(proj_i)
    max_hops = 16 * L + 64
    batches_done = 0
    last_ckpt = time.perf_counter()
    base_prune_chunk = min(cfg.prune_batch, 256)

    for s, e, b in phase_b_schedule(N, B):
        if e <= start:
            continue  # resumed past this batch
        # a checkpoint from a different schedule (e.g. pre-ramp) can land
        # mid-batch: process only the unfinished tail, padded to width b
        s = max(s, start)
        prune_chunk = 0 if b % base_prune_chunk else base_prune_chunk
        nodes = np.arange(s, e, dtype=np.int32)
        nodes_ok = np.ones(b, bool)
        if e - s < b:
            nodes = np.concatenate([nodes, np.zeros(b - (e - s), np.int32)])
            nodes_ok[e - s:] = False
        nodes_dev = jnp.asarray(nodes)
        # visited-free dedup mode: same expansion sequence (test-pinned),
        # but no [B, N/32] visited state or its gather/scatter — the single
        # largest per-hop cost at N >= 1M (scripts/probe_merge.py). One
        # full-width gather+merge per hop (gather_chunk=0) since every
        # neighbor is scored.
        res = beam_search_batch(
            supply_i_dev, base_dev, base_dev[nodes_dev], jnp.int32(ep),
            k=1, L=L, metric=cfg.metric, max_hops=max_hops,
            capture=R, exclude_self=True, self_ids=nodes_dev,
            expand_width=cfg.search_expand, visited_mode="dedup",
            gather_chunk=0)
        # split by default: the fused step program deterministically faults
        # the axon TPU runtime at ramp widths >= 64 (see _phase_b_step);
        # ROAR_PHASEB_FUSED=1 restores the single-dispatch step
        step = (_phase_b_step if os.environ.get("ROAR_PHASEB_FUSED")
                else _phase_b_step_split)
        supply_i_dev, supply_d_dev, deg_dev = step(
            supply_i_dev, supply_d_dev, deg_dev, res.ret_ids, res.ret_dists,
            nodes_dev, jnp.asarray(nodes_ok), proj_i_dev, base_dev,
            metric=cfg.metric, M=M, W=W, prune_chunk=prune_chunk)

        batches_done += 1
        if batches_done % _phase_b_sync_every() == 0:
            # bounded dispatch run-ahead: the async host loop can otherwise
            # queue the entire phase ahead of the device (progress prints
            # then lie, and the final fetch blocks on a backlog that looks
            # like a hang through the relay). One scalar fetch per window
            # keeps the host ~one window ahead at negligible cost.
            int(deg_dev[0])
        if batches_done % 25 == 0 and N > 4 * B:
            # also the liveness signal for stall watchdogs: one line per
            # bounded-run-ahead window (prints reflect dispatch, the %50
            # scalar fetch above keeps dispatch within a window of truth)
            import sys
            print(f"phase B: {e}/{N}", flush=True, file=sys.stderr)
        # time-based checkpoint cadence: the state is O(N) (1.4 GB at 2.5M)
        # and a fixed every-k-batches write was measured at ~40% of phase-B
        # wall once the batches themselves got fast
        if ckpt and time.perf_counter() - last_ckpt > checkpoint_secs:
            tmp = ckpt[:-4] + "_tmp.npz"
            np.savez(tmp[:-4], supply_i=_fetch_rows(supply_i_dev),
                     supply_d=_fetch_rows(supply_d_dev),
                     deg=np.asarray(deg_dev), next=np.int64(e))
            os.replace(tmp, ckpt)
            last_ckpt = time.perf_counter()
    if ckpt and os.path.exists(ckpt):
        os.remove(ckpt)
    # Chunked D2H (writable copies): single multi-hundred-MB fetches have
    # been observed to wedge the tunnel worker; bounded slices behave.
    return _fetch_rows(supply_i_dev), _fetch_rows(supply_d_dev)


def _phase_b_sync_every() -> int:
    """Dispatch run-ahead window for the phase-B host loop (batches between
    scalar syncs). Env-tunable: ROAR_PHASEB_SYNC=1 serializes every batch
    (bisect mode for device faults that surface at the next fetch)."""
    return max(int(os.environ.get("ROAR_PHASEB_SYNC", "50")), 1)


def _fetch_rows(a, chunk_bytes: int = 32 << 20):
    """Fetch a device array row-range-by-row-range into a writable numpy
    array. Equivalent to ``np.array(a)`` with bounded per-transfer size."""
    row_bytes = max(int(np.prod(a.shape[1:])) * a.dtype.itemsize, 1)
    rows = max(chunk_bytes // row_bytes, 1)
    out = np.empty(a.shape, a.dtype)
    n = a.shape[0]
    for i in range(0, n, rows):
        out[i: i + rows] = np.asarray(a[i: i + rows])
    return out


def _merge_supply(proj_i: np.ndarray, supply_i: np.ndarray, M_pjbp: int):
    """Append up to ``2*M_pjbp`` supply neighbors not already present to each
    projection list (``src/index_bipartite.cpp:1251-1269``)."""
    N, Wp = proj_i.shape
    Ws = supply_i.shape[1]
    width = Wp + 2 * M_pjbp
    out = np.full((N, width), PAD, np.int32)
    out[:, :Wp] = proj_i
    deg = (proj_i != PAD).sum(axis=1).astype(np.int64)

    row_ids = np.arange(N, dtype=np.int64)
    sup_valid = supply_i != PAD
    # row-membership (chunked over rows): supply id already in the node's
    # projection list? (replaces the composite-key isin join)
    novel = np.zeros_like(sup_valid)
    CH = max(1, 2**24 // max(Wp * Ws, 1))
    for s_ in range(0, N, CH):
        e_ = min(s_ + CH, N)
        novel[s_:e_] = sup_valid[s_:e_] & ~(
            supply_i[s_:e_, :, None] == proj_i[s_:e_, None, :]).any(axis=2)
    rank = np.cumsum(novel, axis=1) - 1
    keep = novel & (rank < 2 * M_pjbp)
    r_idx = np.broadcast_to(row_ids[:, None], (N, Ws))[keep]
    pos = (deg[:, None] + rank)[keep]
    out[r_idx, pos] = supply_i[keep]
    max_deg = int((out != PAD).sum(axis=1).max()) if N else 0
    return out[:, :max(max_deg, 1)]


# ---------------------------------------------------------------------------
# Top-level build
# ---------------------------------------------------------------------------

def build_roargraph(base, train_knn, cfg: BuildConfig | None = None,
                    *, verbose: bool = False,
                    checkpoint_dir: str | None = None,
                    checkpoint_secs: float = 300.0,
                    phase_a: tuple | None = None):
    """Build a RoarGraph projection index.

    Args:
      base:      [N, D] base vectors (already normalized for COSINE).
      train_knn: [Nq, >=M_sq] exact NN ids of training queries against base —
                 the output of :func:`roargraph_tpu.ops.topk.knn` (or a loaded
                 reference gt file, ``LoadLearnBaseKNN``
                 ``src/index_bipartite.cpp:2622-2642``). May be None when
                 ``phase_a`` is supplied.
      cfg:       build parameters.
      checkpoint_dir: when set, the build is resumable: phase A results and
                 periodic phase-B progress are checkpointed there (the
                 reference's build is monolithic — SURVEY.md §5.4; a
                 10M-scale connectivity pass is hours of work worth saving).
      phase_a:   optional precomputed raw phase-A adjacency (adj_i, adj_d)
                 *before* the reverse-symmetrization rounds — the SPMD
                 sharded build computes it for all shards in one mesh
                 program (``dist.sharded``) and finishes each shard here.

    Returns (PaddedGraph, BuildReport).
    """
    cfg = cfg or BuildConfig()
    if train_knn is None and phase_a is None:
        raise ValueError("need train_knn or phase_a")
    # accept either host or device-resident vectors; a jax array passes
    # through without a fresh 100s-scale upload over the device link
    N = base.shape[0]
    base_dev = jnp.asarray(base)
    t0 = time.perf_counter()

    ep = compute_medoid(base_dev)
    assert 0 <= ep < N

    # ---- Phase A: projection ------------------------------------------
    ckpt_a = (os.path.join(checkpoint_dir, "phase_a.npz")
              if checkpoint_dir else None)
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
    resumed_a = False
    if ckpt_a and os.path.exists(ckpt_a):
        with np.load(ckpt_a) as z:
            adj_i, adj_d = z["adj_i"], z["adj_d"]
        if adj_i.shape == (N, cfg.M_pjbp):
            resumed_a = True
            if verbose:
                print(f"resumed phase A from {ckpt_a}")
        else:
            # a checkpoint from a different (N, M_pjbp) config — a blind
            # resume would corrupt the build; recompute instead
            import sys
            print(f"ignoring stale phase-A checkpoint {ckpt_a} "
                  f"(shape {adj_i.shape} != {(N, cfg.M_pjbp)})",
                  file=sys.stderr)
    if not resumed_a:
        if phase_a is not None:
            adj_i, adj_d = np.array(phase_a[0]), np.array(phase_a[1])
        else:
            adj_i, adj_d = _phase_a(base_dev, np.asarray(train_knn), cfg, N)
        # two reverse-symmetrization rounds: the per-query inserts plus the
        # post-phase flush (``LinkProjection:1092`` and ``:1100-1104``)
        for _ in range(2):
            adj_i, adj_d = _reverse_round(
                adj_i, adj_d, base_dev, metric=cfg.metric, cap=cfg.M_pjbp,
                prune_M=cfg.M_pjbp, prune_backfill=True,
                out_width=cfg.M_pjbp, batch=cfg.prune_batch)
        if ckpt_a:
            np.savez(ckpt_a[:-4], adj_i=adj_i, adj_d=adj_d)
    t1 = time.perf_counter()
    if verbose:
        print(f"projection time: {t1 - t0:.2f}s")

    # ---- Phase B: connectivity augmentation (incremental; reverse
    # inserts bounded at 2*M happen inside, ``SupplyAddReverse:1353``) ----
    supply_i, supply_d = _phase_b_search_prune(
        adj_i, adj_d, base_dev, cfg, ep, adj_i,
        checkpoint_dir=checkpoint_dir, checkpoint_secs=checkpoint_secs)
    # final degree check: any node above M is re-pruned to M
    # (``LinkProjection:1224-1248``)
    over = np.flatnonzero((supply_i != PAD).sum(axis=1) > cfg.M_pjbp)
    if over.size:
        pi, pd = _prune_rows_device(
            supply_i[over], supply_d[over], supply_i[over] != PAD,
            over.astype(np.int32), base_dev,
            metric=cfg.metric, M=cfg.M_pjbp, backfill=False,
            batch=cfg.prune_batch)
        supply_i[over] = PAD
        supply_d[over] = np.inf
        supply_i[over, : cfg.M_pjbp] = pi
        supply_d[over, : cfg.M_pjbp] = pd

    # merge novel supply edges into the projection graph (``:1251-1269``)
    merged = _merge_supply(adj_i, supply_i, cfg.M_pjbp)
    t2 = time.perf_counter()
    if verbose:
        print(f"connectivity enhancement time: {t2 - t1:.2f}s")

    graph = PaddedGraph(ids=merged, ep=int(ep))
    from .graph import stats as gstats
    report = BuildReport(projection_s=t1 - t0, connectivity_s=t2 - t1,
                         total_s=t2 - t0, stats=gstats(graph))
    return graph, report
