"""Batched occlusion (RNG/Vamana-style) pruning.

The reference prunes one node at a time with a sequential greedy loop over
rank-ordered candidates, occluding p when some already-kept t satisfies
``d(p, t) < d(p, node)`` (``PruneBiSearchBaseGetBase``,
``src/index_bipartite.cpp:1612-1694`` and its three variants,
``:1434-1610``, ``:1846-1940``; all passes use alpha = 1.0).

TPU formulation: one small matmul per node gives the full candidate-candidate
distance matrix; a ``lax.scan`` over candidate ranks updates a keep-mask.
Everything is batched over nodes with fixed shapes — thousands of nodes are
pruned per device step.

Variant knobs (mirroring the reference's four prune functions):

- ``backfill``:  top up to exactly M with the closest rejected candidates
  (``PruneBiSearchBaseGetBase:1685-1691``,
  ``PruneProjectionReverseCandidates:1596-1600``). The supply-side prunes have
  no backfill (``PruneProjectionInternalReverseCandidates``,
  ``PruneProjectionBaseSearchCandidates``).
- ``defer_mask``: candidates flagged here cannot be the *first* kept element;
  a flagged prefix is re-considered only after everything else
  (``PruneProjectionBaseSearchCandidates:1858-1865`` defers candidates already
  present in the node's projection list; its second pass ``:1896-1928``
  revisits them, except sorted rank 0 which is dropped for good).

The semantically-dead "relaxed" second passes of the reference (same alpha,
monotone keep-set, hence provably no-ops) are not reproduced.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Metric

INVALID = jnp.int32(-1)
_BIG_I32 = jnp.int32(2**31 - 1)


def _sort_by_score_id(ids, dists, valid):
    """Sort candidates by (dist, id) ascending — the reference's Neighbor
    ordering (``neighbor.h:29-31``). Invalid slots sort last."""
    d = jnp.where(valid, dists, jnp.inf)
    i = jnp.where(valid, ids, _BIG_I32)
    d, i, v = jax.lax.sort((d, i, valid.astype(jnp.int32)), num_keys=2)
    return i, d, v.astype(bool)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "M", "backfill", "use_defer", "precision"))
def occlusion_prune(
    cand_ids: jnp.ndarray,    # [B, C] int32 (-1 or any value where invalid)
    cand_dists: jnp.ndarray,  # [B, C] f32 — score(candidate, node)
    cand_valid: jnp.ndarray,  # [B, C] bool (False = padding / self / dup)
    node_vecs: jnp.ndarray,   # [B, D] unused today, reserved for alpha variants
    all_vecs: jnp.ndarray,    # [N, D] vector table for candidate gathers
    *,
    metric: Metric,
    M: int,
    backfill: bool = False,
    defer_mask: jnp.ndarray | None = None,  # [B, C] bool
    use_defer: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Prune each row's candidate set to at most ``M`` ids.

    Candidates must already be deduplicated by id per row and must not contain
    the node itself (callers mask those into ``cand_valid``). Returns a pair
    ``(ids [B, M] int32 padded -1, dists [B, M] f32 padded +inf)`` in greedy
    keep order (backfill appended last).
    """
    B, C = cand_ids.shape

    sids, sdists, svalid = _sort_by_score_id(cand_ids, cand_dists, cand_valid)
    if use_defer:
        # Carry the defer flag through the same composite (dist, id) sort so
        # it stays aligned with the sorted candidates.
        d = jnp.where(cand_valid, cand_dists, jnp.inf)
        i = jnp.where(cand_valid, cand_ids, _BIG_I32)
        _, _, dm = jax.lax.sort(
            (d, i, defer_mask.astype(jnp.int32)), num_keys=2)
        dm = dm.astype(bool) & svalid
        # First index that is valid and not deferred:
        pickable = svalid & ~dm
        start0 = jnp.argmax(pickable, axis=1)          # [B]
        has_pick = jnp.any(pickable, axis=1)
        start0 = jnp.where(has_pick, start0, 0)
        # Processing order: [start0 .. C-1] then [1 .. start0-1]; sorted rank 0
        # is dropped when deferred (parity with the reference's pass-2 starting
        # at index 1).
        r = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
        in_tail = r < start0[:, None]
        key = jnp.where(in_tail, r + C, r)
        key = jnp.where((r == 0) & (start0[:, None] > 0), 2 * C + 1, key)
        perm = jnp.argsort(key, axis=1)
        sids = jnp.take_along_axis(sids, perm, axis=1)
        sdists = jnp.take_along_axis(sdists, perm, axis=1)
        svalid = jnp.take_along_axis(svalid, perm, axis=1)
        dropped = (r == 0) & (start0[:, None] > 0)
        svalid = svalid & ~jnp.take_along_axis(dropped, perm, axis=1)

    # Candidate-candidate score matrix: one batched matmul per row.
    cvecs = all_vecs[jnp.clip(sids, 0, all_vecs.shape[0] - 1)]   # [B, C, D]
    # pw[b, i, j] = score(cand_i, cand_j)
    dots = jax.lax.dot_general(
        cvecs, cvecs,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.L2:
        sq = jnp.sum(cvecs.astype(jnp.float32) ** 2, axis=2)
        pw = sq[:, :, None] + sq[:, None, :] - 2.0 * dots
    else:
        pw = -dots

    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)

    def step(carry, r):
        keep, count = carry                        # [B, C] bool, [B] int32
        d_r = jax.lax.dynamic_slice_in_dim(sdists, r, 1, axis=1)[:, 0]
        v_r = jax.lax.dynamic_slice_in_dim(
            svalid.astype(jnp.int32), r, 1, axis=1)[:, 0].astype(bool)
        row = jax.lax.dynamic_slice_in_dim(pw, r, 1, axis=1)[:, 0, :]  # [B, C]
        occluded = jnp.any(keep & (row < d_r[:, None]), axis=1)
        can = v_r & ~occluded & (count < M)
        keep = jnp.where((col == r) & can[:, None], True, keep)
        return (keep, count + can.astype(jnp.int32)), None

    init = (jnp.zeros((B, C), bool), jnp.zeros((B,), jnp.int32))
    (keep, count), _ = jax.lax.scan(step, init, jnp.arange(C, dtype=jnp.int32))

    keep_rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    scatter_col = jnp.where(keep, keep_rank, M)  # M = dropped bucket
    if backfill:
        # Fill remaining slots with the closest rejected valid candidates;
        # backfilled ids are *appended after* the greedy keeps, matching the
        # reference's final top-up loop (``PruneBiSearchBaseGetBase:1685-1691``).
        rejected = svalid & ~keep
        fill_rank = jnp.cumsum(rejected.astype(jnp.int32), axis=1) - 1
        fill = rejected & (count[:, None] + fill_rank < M)
        scatter_col = jnp.where(fill, count[:, None] + fill_rank, scatter_col)
        keep = keep | fill

    # Compact kept (id, dist) pairs in processing order into fixed [B, M]
    # outputs. One-hot-free scatter: pad one junk column then slice it away.
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    colw = jnp.clip(scatter_col, 0, M)
    out_ids = jnp.full((B, M + 1), INVALID, jnp.int32)
    out_ids = out_ids.at[b_idx, colw].set(
        jnp.where(keep, sids, INVALID), mode="drop")
    out_d = jnp.full((B, M + 1), jnp.inf, jnp.float32)
    out_d = out_d.at[b_idx, colw].set(
        jnp.where(keep, sdists, jnp.inf), mode="drop")
    return out_ids[:, :M], out_d[:, :M]
