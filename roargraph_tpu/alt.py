"""Legacy/alternate build paths, TPU-reformulated (inventory completeness).

The reference ships ~1100 LoC of build/search paths that none of its four
drivers reach (SURVEY.md §2.1 "Legacy/alternate build paths"; verified dead
code). This module provides semantics-parity equivalents so every component
in the inventory has a counterpart:

- :func:`incremental_bipartite_build` — the NSG-style incremental bipartite
  insertion (``LinkBipartite``/``LinkOneNode``,
  ``src/index_bipartite.cpp:445-527`` / ``:358-443``): nodes inserted in the
  reference's alternating base/query order; each insertion two-hop-searches
  the graph built so far from the opposite side
  (``SearchBipartitebyBase:637-773`` / ``SearchBipartitebyQuery:776-890``),
  reachability-prunes the pool (``PruneCandidates:529-572``), writes the
  out-list, and inserts bounded reverse edges with re-prune
  (``AddReverse:574-634``). Finished with the reference's reverse-flush and
  underfull-relink passes (``:506-526``).
- :func:`reachability_prune` — the batched ``PruneCandidates`` rule: keep a
  candidate iff it is not already reachable within two hops of the kept set;
  backfill in pool order to the degree bound.
- :func:`local_join_prune` — ``PruneLocalJoinCandidates:892-949``: insert
  one candidate into a node's projection list under the occlusion rule.

TPU stance: the reference path is itself nondeterministic (``random_device``
seeds, thread-racy snapshots) and unreachable from any driver, so parity is
*semantic*: wavefront-batched insertion (a wave of W nodes searches one
frozen snapshot — the moral equivalent of W racy OpenMP threads), seeded
RNG, device-batched two-hop search and distance work, host-side adjacency
mutation between waves (build-phase orchestration, like phase A's host
scatter). ``TrainingLink2Projection:960-1041`` needs no port: its three
loops are exactly phase A + the reverse flush + the supply merge, all live
in :mod:`roargraph_tpu.build`.

This is a parity module, not a serving path: the shipped flagship build is
:func:`roargraph_tpu.build.build_roargraph`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bipartite import BipartiteIndex
from .config import Metric
from .graph import PAD
from .ops.distance import batched_scores

BIG = jnp.int32(2**31 - 1)


def _np_scores(q: np.ndarray, X: np.ndarray, metric: Metric) -> np.ndarray:
    """Host-side smaller-is-better scores for tiny re-prune pools (a device
    round-trip per overflowing reverse target would dominate)."""
    if metric is Metric.L2:
        d = X - q[None, :]
        return np.einsum("nd,nd->n", d, d)
    return -(X @ q)  # IP negated (cosine vectors arrive pre-normalized)


# ---------------------------------------------------------------------------
# PruneCandidates (reachability prune), batched
# ---------------------------------------------------------------------------

def reachability_prune(pool_ids, pool_dists, pool_valid, adj, bound):
    """Batched ``PruneCandidates`` (``src/index_bipartite.cpp:529-572``).

    Scan each row's pool in (dist, id) order; keep a candidate iff it is not
    flagged reachable; each keep flags the candidate and its two-hop
    neighborhood ``adj[adj[c]]``. Backfill pass appends unkept pool ids in
    order until ``bound`` (``:560-571``).

    ``pool_ids [W, P]`` int32 (global ids into ``adj``'s row space),
    ``adj [Nt, Wmax]`` int32 PAD-padded. Returns ``[W, bound]`` int32,
    PAD-padded. O(P) scan with [W, Nt] bool reach state — the legacy rule
    is inherently 2-hop-closure sequential; acceptable at parity-module
    scale.
    """
    return _reachability_prune(pool_ids, pool_dists,
                               pool_valid, adj, bound=int(bound))


@functools.partial(jax.jit, static_argnames=("bound",))
def _reachability_prune(pool_ids, pool_dists, pool_valid, adj, *, bound):
    W, P = pool_ids.shape
    Nt, Wmax = adj.shape
    d = jnp.where(pool_valid, pool_dists, jnp.inf)
    i = jnp.where(pool_valid, pool_ids, BIG)
    d, i = jax.lax.sort((d, i), num_keys=2)
    rows = jnp.arange(W)

    reach = jnp.zeros((W, Nt), bool)
    kept = jnp.full((W, bound), PAD, jnp.int32)
    nk = jnp.zeros((W,), jnp.int32)

    def step(r, state):
        reach, kept, nk = state
        c = i[:, r]
        ok = (c != BIG) & (nk < bound)
        c_s = jnp.clip(c, 0, Nt - 1)
        keep = ok & ~reach[rows, c_s]
        kept = kept.at[rows, jnp.clip(nk, 0, bound - 1)].set(
            jnp.where(keep, c, kept[rows, jnp.clip(nk, 0, bound - 1)]))
        nk = nk + keep.astype(jnp.int32)
        # flag c and its 2-hop neighborhood (neighbors' neighbors, ``:553``)
        reach = reach.at[rows, c_s].set(reach[rows, c_s] | keep)
        nb = adj[c_s]                                       # [W, Wmax]
        nb_s = jnp.clip(nb, 0, Nt - 1)
        nnb = adj[nb_s].reshape(W, Wmax * Wmax)             # [W, Wmax^2]
        valid2 = (nb != PAD)[:, :, None].repeat(Wmax, 2).reshape(
            W, Wmax * Wmax) & (nnb != PAD) & keep[:, None]
        nnb_s = jnp.clip(nnb, 0, Nt - 1)
        r2 = jax.lax.broadcasted_iota(jnp.int32, nnb_s.shape, 0)
        reach = reach.at[r2, nnb_s].max(valid2)
        return reach, kept, nk

    reach, kept, nk = jax.lax.fori_loop(0, P, step, (reach, kept, nk))

    # backfill: unkept pool entries in order (membership by compare — the
    # kept list is <= bound wide)
    def bstep(r, state):
        kept, nk = state
        c = i[:, r]
        inlist = jnp.any(kept == c[:, None], axis=1)
        ok = (c != BIG) & ~inlist & (nk < bound)
        kept = kept.at[rows, jnp.clip(nk, 0, bound - 1)].set(
            jnp.where(ok, c, kept[rows, jnp.clip(nk, 0, bound - 1)]))
        nk = nk + ok.astype(jnp.int32)
        return kept, nk

    kept, nk = jax.lax.fori_loop(0, P, bstep, (kept, nk))
    return kept


# ---------------------------------------------------------------------------
# SearchBipartitebyBase / byQuery (two-hop search of the partial graph)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("L", "max_hops", "metric",
                                             "opp_lo_is_query"))
def _search_partial_batch(adj, vecs, queries, init_ids, *, L, max_hops,
                          metric, opp_lo_is_query):
    """Lockstep two-hop beam over the in-progress bipartite graph.

    ``adj [Nt, Wmax]`` global-id adjacency (both sides), ``vecs [Nt, D]``
    stacked base+query vectors, ``queries [W, D]`` the wave's vectors,
    ``init_ids [W, I]`` opposite-side start nodes. One expansion = the
    frontier's adjacency then those nodes' adjacency (parity with the
    alternating-side loops at ``:702-741`` / ``:840-875``); the queue holds
    opposite-side nodes only. Returns the final (dists, ids) queue — the
    prune pool."""
    Nt, Wmax = adj.shape
    W, I = init_ids.shape
    rows = jnp.arange(W)

    d0 = batched_scores(queries, vecs[jnp.clip(init_ids, 0, Nt - 1)], metric)
    d0 = jnp.where(init_ids != BIG, d0, jnp.inf)
    pad = max(L - I, 0)
    q_d = jnp.concatenate([d0, jnp.full((W, pad), jnp.inf)], 1)[:, :L]
    q_i = jnp.concatenate([init_ids,
                           jnp.full((W, pad), BIG, jnp.int32)], 1)[:, :L]
    q_d, q_i = jax.lax.sort((q_d, q_i), num_keys=2)
    q_e = jnp.zeros((W, L), jnp.int32)
    F = Wmax * Wmax
    r2 = jax.lax.broadcasted_iota(jnp.int32, (W, F), 0)
    Wb = (Nt + 31) // 32
    visited = jnp.zeros((W, Wb), jnp.uint32)

    def cond(state):
        q_d, q_i, q_e, visited, it = state
        return jnp.any((q_e == 0) & (q_i != BIG)) & (it < max_hops)

    def body(state):
        q_d, q_i, q_e, visited, it = state
        unexp = (q_e == 0) & (q_i != BIG)
        active = jnp.any(unexp, axis=1)
        j = jnp.argmax(unexp, axis=1)
        f = q_i[rows, j]
        q_e = q_e.at[rows, j].set(jnp.where(active, 1, q_e[rows, j]))
        f_s = jnp.clip(f, 0, Nt - 1)
        nb = adj[f_s]                                       # [W, Wmax] own side
        v1 = (nb != PAD) & active[:, None]
        nnb = adj[jnp.clip(nb, 0, Nt - 1)].reshape(W, F)    # [W, F] opp side
        valid = (nnb != PAD) & jnp.repeat(v1, Wmax, axis=1)
        n_s = jnp.clip(nnb, 0, Nt - 1)
        # first-occurrence dedup inside the block
        ord_ = jnp.argsort(jnp.where(valid, n_s, BIG), axis=1)
        s_ids = jnp.take_along_axis(n_s, ord_, axis=1)
        s_val = jnp.take_along_axis(valid, ord_, axis=1)
        first = jnp.concatenate(
            [jnp.ones((W, 1), bool), s_ids[:, 1:] != s_ids[:, :-1]], axis=1)
        s_val = s_val & first
        valid = jnp.take_along_axis(s_val, jnp.argsort(ord_, axis=1), axis=1)
        words = visited[r2, n_s // 32]
        bits = jnp.uint32(1) << (n_s % 32).astype(jnp.uint32)
        fresh = valid & ((words & bits) == 0)
        visited = visited.at[r2, n_s // 32].add(
            jnp.where(fresh, bits, jnp.uint32(0)))
        d = batched_scores(queries, vecs[n_s], metric)
        d = jnp.where(fresh, d, jnp.inf)
        ii = jnp.where(fresh, nnb, BIG)
        all_d = jnp.concatenate([q_d, d], axis=1)
        all_i = jnp.concatenate([q_i, ii], axis=1)
        all_e = jnp.concatenate([q_e, jnp.zeros_like(ii)], axis=1)
        all_d, all_i, all_e = jax.lax.sort((all_d, all_i, all_e), num_keys=2)
        return (all_d[:, :L], all_i[:, :L], all_e[:, :L], visited, it + 1)

    state = (q_d, q_i, q_e, visited, jnp.int32(0))
    q_d, q_i, _, _, _ = jax.lax.while_loop(cond, body, state)
    return q_d, q_i


# ---------------------------------------------------------------------------
# LinkBipartite / LinkOneNode, wavefront-batched
# ---------------------------------------------------------------------------

def incremental_bipartite_build(base, train_q, *, M_bp: int, M_sq: int,
                                L_pq: int = 64, metric: Metric | str = "ip",
                                wave: int = 256, seed: int = 0,
                                max_hops: int = 64,
                                verbose: bool = False) -> BipartiteIndex:
    """NSG-style incremental bipartite insertion (``LinkBipartite:445-527``).

    Nodes enter in the reference's alternating order b0,q0,b1,q1,...
    (``:452-466``), batched into waves of ``wave`` per side; a wave searches
    the frozen snapshot left by earlier waves (the batched analog of the
    OpenMP threads' racy snapshots, deterministic here). Each inserted node:
    seeded random opposite-side inits plus the earliest-inserted entry set
    (``:644-683``), two-hop beam search, :func:`reachability_prune` to its
    side's bound (base -> ``M_bp``, query -> ``M_sq``, ``:536``), reverse
    edges with the target-side bound and distance-sorted re-prune
    (``:574-634``). Ends with the reverse-flush pass and one relink of
    underfull nodes (``:506-526``).
    """
    metric = Metric(metric) if not isinstance(metric, Metric) else metric
    base = np.asarray(base, np.float32)
    train_q = np.asarray(train_q, np.float32)
    nd, nsq = base.shape[0], train_q.shape[0]
    Nt = nd + nsq
    rng = np.random.default_rng(seed)
    bound = {True: M_bp, False: M_sq}      # out-bound by is_base
    Wmax = max(M_bp, M_sq) + 1
    adj = np.full((Nt, Wmax), PAD, np.int32)
    deg = np.zeros(Nt, np.int32)
    vecs = np.concatenate([base, train_q], axis=0)
    vecs_dev = jnp.asarray(vecs)

    # alternating insertion order (``:452-466``)
    order = []
    i_bp = j_sq = 0
    while i_bp + j_sq < Nt:
        if i_bp < nd:
            order.append(i_bp)
            i_bp += 1
        if j_sq < nsq:
            order.append(nd + j_sq)
            j_sq += 1
    order = np.asarray(order, np.int64)

    def _prune_pool(ids_w, d_w, nodes, b):
        valid = (ids_w != BIG) & (ids_w != nodes[:, None])
        return np.asarray(reachability_prune(
            jnp.asarray(np.where(valid, ids_w, BIG)), jnp.asarray(d_w),
            jnp.asarray(valid), jnp.asarray(adj), bound=b))

    def _insert_wave(nodes):
        """Search + prune + write + reverse for one same-side wave."""
        is_base = nodes[0] < nd
        b_out = bound[bool(is_base)]
        W = nodes.size
        q_vecs = (base[nodes] if is_base else train_q[nodes - nd])
        # inits: random opposite side + the earliest-inserted entry set
        # (the reference's sq_en_set_/bp_en_set_, first ~200 inserted)
        lo, n_opp = (nd, nsq) if is_base else (0, nd)
        n_init = min(8, max(2, L_pq // 8))
        init = rng.integers(0, n_opp, (W, n_init)).astype(np.int64) + lo
        linked = np.flatnonzero(deg[lo:lo + n_opp] > 0)[:200] + lo
        if linked.size:
            ent = linked[rng.integers(0, linked.size, (W, 2))]
            init = np.concatenate([init, ent], axis=1)
        d_w, ids_w = _search_partial_batch(
            jnp.asarray(adj), vecs_dev, jnp.asarray(q_vecs),
            jnp.asarray(init.astype(np.int32)), L=L_pq, max_hops=max_hops,
            metric=metric, opp_lo_is_query=bool(is_base))
        kept = _prune_pool(np.asarray(ids_w), np.asarray(d_w), nodes, b_out)
        # write out-lists (wave = frozen snapshot; last writer wins, like
        # the reference's unsynchronized inter-thread order)
        adj[nodes] = PAD
        adj[nodes, :kept.shape[1]] = kept
        deg[nodes] = (kept != PAD).sum(axis=1)
        _reverse_edges(nodes, kept)

    def _reverse_edges(srcs, kept):
        """``AddReverse:574-634``: append src to each kept target, re-prune
        targets pushed past their side's bound by (dist, id) order with the
        reachability rule."""
        tgts = kept[kept != PAD]
        rsrc = np.broadcast_to(srcs[:, None], kept.shape)[kept != PAD]
        if not tgts.size:
            return
        o = np.argsort(tgts, kind="stable")
        tgts, rsrc = tgts[o], rsrc[o]
        for t, s in zip(tgts, rsrc):           # host: append if absent
            row = adj[t]
            if s in row[:deg[t]]:
                continue
            b_t = bound[bool(t < nd)]
            if deg[t] < min(b_t, Wmax):
                adj[t, deg[t]] = s
                deg[t] += 1
            else:
                adj[t, Wmax - 1] = s           # overflow slot, re-pruned now
                cand = adj[t][adj[t] != PAD]
                cd = _np_scores(vecs[t], vecs[cand], metric)
                keep = _prune_pool(cand[None, :].astype(np.int32),
                                   cd[None, :].astype(np.float32),
                                   np.asarray([t]), b_t)[0]
                keep = keep[keep != PAD]
                adj[t] = PAD
                adj[t, :keep.size] = keep
                deg[t] = keep.size

    waves = 0
    for s in range(0, order.size, 2 * wave):
        chunk = order[s: s + 2 * wave]
        for side in (chunk[chunk < nd], chunk[chunk >= nd]):
            if side.size:
                _insert_wave(side)
        waves += 1
        if verbose and waves % 8 == 0:
            print(f"incremental build: {min(s + 2 * wave, order.size)}"
                  f"/{order.size}", flush=True)

    # reverse flush (``:506-511``) is implicit (reverse edges are applied
    # per wave); relink underfull nodes once (``:515-526``)
    for side_nodes in (np.flatnonzero(deg[:nd] < M_bp),
                       nd + np.flatnonzero(deg[nd:] < M_sq)):
        for s in range(0, side_nodes.size, wave):
            w = side_nodes[s: s + wave]
            if w.size:
                _insert_wave(w)

    # split the global adjacency into the BipartiteIndex layout
    base_rows = adj[:nd]
    base_adj = np.where(base_rows == PAD, PAD, base_rows - nd).astype(np.int32)
    query_adj = adj[nd:].astype(np.int32)
    return BipartiteIndex(base_adj=base_adj, query_adj=query_adj)


# ---------------------------------------------------------------------------
# PruneLocalJoinCandidates
# ---------------------------------------------------------------------------

def local_join_prune(node_ids, cand_ids, graph_ids, base, *, M: int,
                     metric: Metric | str = "ip"):
    """Batched ``PruneLocalJoinCandidates`` (``:892-949``): insert one
    candidate into each node's projection list under the occlusion rule
    (sequential greedy in distance order, second relaxed membership pass as
    backfill). Returns new ``[B, M]`` int32 rows (PAD-padded).

    ``node_ids [B]``, ``cand_ids [B]``, ``graph_ids [N, Mmax]``."""
    from .ops.prune import occlusion_prune

    metric = Metric(metric) if not isinstance(metric, Metric) else metric
    node_ids = jnp.asarray(node_ids, jnp.int32)
    cand_ids = jnp.asarray(cand_ids, jnp.int32)
    base = jnp.asarray(base)
    rows = jnp.asarray(graph_ids)[node_ids]                  # [B, Mmax]
    pool = jnp.concatenate([rows, cand_ids[:, None]], axis=1)
    # self/dup/PAD masking: the reference skips nbr == node (``:899``);
    # existing rows are unique by build invariant, so the only possible
    # duplicate is the inserted candidate itself
    cand_dup = jnp.any(rows == cand_ids[:, None], axis=1)
    valid = jnp.concatenate(
        [(rows != PAD) & (rows != node_ids[:, None]),
         (~cand_dup & (cand_ids != node_ids))[:, None]], axis=1)
    node_vecs = base[node_ids]
    d = batched_scores(node_vecs, base[jnp.clip(pool, 0, base.shape[0] - 1)],
                       metric)
    ids, _ = occlusion_prune(pool, d, valid, node_vecs, base,
                             metric=metric, M=M, backfill=True)
    return ids
