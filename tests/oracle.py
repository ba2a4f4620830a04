"""Pure-numpy oracles that replicate the reference's sequential semantics
(written from the behavioral description in SURVEY.md — NeighborPriorityQueue
ordering (dist, id) with id-dedup, greedy occlusion prune with alpha=1.0,
expand-until-exhausted beam search). Used to validate the batched TPU kernels.
"""
from __future__ import annotations

import numpy as np


def score(a, b, metric):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if metric == "l2":
        d = a - b
        return float(np.dot(d, d))
    return -float(np.dot(a, b))


def brute_knn(queries, base, k, metric):
    q = np.asarray(queries, np.float64)
    b = np.asarray(base, np.float64)
    if metric == "l2":
        d = ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    else:
        d = -(q @ b.T)
    order = np.lexsort((np.broadcast_to(np.arange(b.shape[0]), d.shape), d),
                       axis=1)
    ids = order[:, :k]
    return ids, np.take_along_axis(d, ids, axis=1)


def occlusion_prune(cand_ids, cand_dists, pair_score, M, *, backfill=False,
                    defer=None):
    """Greedy RNG prune over (dist, id)-sorted candidates.

    ``pair_score(i, j)`` -> score between candidate ids i and j.
    ``defer``: set of ids that cannot seed the result and are reconsidered
    only after the main pass (sorted rank 0 dropped if deferred)."""
    order = sorted(range(len(cand_ids)),
                   key=lambda t: (cand_dists[t], cand_ids[t]))
    ids = [cand_ids[t] for t in order]
    dists = [cand_dists[t] for t in order]
    defer = defer or set()

    start0 = None
    for t in range(len(ids)):
        if ids[t] not in defer:
            start0 = t
            break
    if start0 is None:
        return []
    sequence = list(range(start0, len(ids))) + [
        t for t in range(1, start0)]

    result = []
    for t in sequence:
        if len(result) >= M:
            break
        p_id, p_d = ids[t], dists[t]
        if p_id in result:
            continue
        occluded = any(pair_score(p_id, r) < p_d for r in result)
        if not occluded:
            result.append(p_id)

    if backfill:
        for t in range(len(ids)):
            if len(result) >= M:
                break
            if ids[t] not in result:
                result.append(ids[t])
    return result


def beam_search(adj_lists, base, query, ep, k, L, metric, *,
                exclude=None, mark_ep_visited=True, capture=False):
    """Sequential best-first beam search with a sorted capacity-L queue,
    (dist, id) ordering, id-dedup on insert, visited-on-scan semantics."""
    import heapq  # noqa: F401  (kept simple: list-based queue like the ref)

    queue = []  # list of [dist, id, expanded], kept sorted by (dist, id)

    def insert(d, i):
        if len(queue) == L and (queue[-1][0], queue[-1][1]) < (d, i):
            return
        for q in queue:
            if q[1] == i:
                return
        queue.append([d, i, False])
        queue.sort(key=lambda x: (x[0], x[1]))
        del queue[L:]

    visited = set()
    d0 = score(base[ep], query, metric)
    insert(d0, ep)
    if mark_ep_visited:
        visited.add(ep)
    cmps, hops = 1, 0
    ret = []
    while True:
        cur = next((q for q in queue if not q[2]), None)
        if cur is None:
            break
        cur[2] = True
        hops += 1
        if capture:
            ret.append((cur[1], cur[0]))
        for nbr in adj_lists[cur[1]]:
            nbr = int(nbr)
            if nbr in visited or (exclude is not None and nbr == exclude):
                continue
            visited.add(nbr)
            d = score(base[nbr], query, metric)
            cmps += 1
            insert(d, nbr)
    ids = [q[1] for q in queue[:k]]
    dists = [q[0] for q in queue[:k]]
    if capture:
        return ids, dists, cmps, hops, ret
    return ids, dists, cmps, hops
