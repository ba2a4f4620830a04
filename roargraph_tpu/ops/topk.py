"""Exact brute-force k-NN on the MXU — the in-framework replacement for the
reference's external DiskANN/MKL ``compute_groundtruth`` step
(``README.md:62-75``, SURVEY.md §2.2) and the test oracle for every other
component.

Design: stream the base set through the MXU in tiles; carry a running top-k
per query block and merge each tile's scores into it with ``lax.top_k``. The
whole sweep is one ``lax.scan`` under ``jit`` — static shapes, no host
round-trips per tile.
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Metric
from .distance import pairwise_scores

Precision = jax.lax.Precision


def _merge_topk(run_d, run_i, new_d, new_i, k):
    """Merge running top-k with fresh candidates, keeping smallest scores.

    ``lax.top_k`` selects largest, so negate; it is stable w.r.t. position for
    tied values, which keeps earlier (lower-id) candidates first like the
    reference's (distance, id) ordering (``neighbor.h:29-31``)."""
    all_d = jnp.concatenate([run_d, new_d], axis=1)
    all_i = jnp.concatenate([run_i, new_i], axis=1)
    neg_top, pos = jax.lax.top_k(-all_d, k)
    return -neg_top, jnp.take_along_axis(all_i, pos, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile", "precision", "approx"))
def knn_tiled(
    queries: jnp.ndarray,  # [Q, D]
    base: jnp.ndarray,     # [N, D]  (N padded to a multiple of tile by caller ok)
    *,
    k: int,
    metric: Metric,
    tile: int = 8192,
    precision=Precision.HIGHEST,
    approx: bool = False,
):
    """Exact k-NN of ``queries`` against ``base``: returns
    (ids ``[Q, k]`` int32, scores ``[Q, k]`` f32, smaller=better).

    ``base`` rows beyond ``n_valid`` (i.e. padding) must be pre-masked by the
    caller via :func:`knn` below.

    ``approx=True`` selects each tile's candidates with the TPU-native
    partial-reduce selection (``lax.approx_min_k``, recall_target 0.99 per
    tile) instead of the full ``top_k`` merge — the merge is where the time
    goes (the matmuls are a minority of the wall). Scores of returned
    candidates stay exact; only *which* of the near-tied tail candidates
    survive may differ. Use for training-query NN lists (build input, where
    order noise is equivalent to the reference's thread-race
    nondeterminism), never for eval groundtruth."""
    n = base.shape[0]
    tile = min(tile, n)
    num_tiles = (n + tile - 1) // tile
    # In-place slice schedule: tiles start at i*tile except the last, which
    # starts at n-tile and overlaps its predecessor; overlap rows (global
    # index below the tile's threshold) are masked to +inf so no id enters
    # the merge twice. This replaces a pad-to-multiple copy of the whole
    # base — at the 10M x 200 GT call that copy was a second 9.5 GB HBM
    # allocation and an OOM.
    offs = jnp.asarray([min(i * tile, n - tile) for i in range(num_tiles)],
                       jnp.int32)
    thresh = jnp.asarray([i * tile for i in range(num_tiles)], jnp.int32)

    q = queries.shape[0]
    init_d = jnp.full((q, k), jnp.inf, jnp.float32)
    init_i = jnp.full((q, k), jnp.iinfo(jnp.int32).max, jnp.int32)

    def step(carry, inp):
        run_d, run_i = carry
        off, th = inp
        tile_vecs = jax.lax.dynamic_slice_in_dim(base, off, tile)
        scores = pairwise_scores(queries, tile_vecs, metric, precision=precision)
        # Padding rows contain inf; inf*0 in dots would make nan — mask any
        # non-finite score to +inf so it never wins. Overlap rows of the
        # final tile likewise.
        fresh = (off + jnp.arange(tile, dtype=jnp.int32)) >= th
        scores = jnp.where(jnp.isfinite(scores) & fresh[None, :], scores,
                           jnp.inf)
        ids = off + jax.lax.broadcasted_iota(jnp.int32, (q, tile), 1)
        if approx == "block":
            # Block-min candidate pre-selection: one VPU min-reduce per
            # 64-score block (pure bandwidth, no sorting network), then an
            # exact top-k over the block winners. A candidate is lost only
            # when two true top-k members share a 64-block of one tile —
            # for k=100 over multi-100k bases that is rarer than
            # approx_min_k's 0.99 per-tile recall target, and the same
            # train-NN tail-noise class either way.
            S = 64
            while tile % S:  # odd test-sized tiles: shrink (S=1 is exact)
                S //= 2
            nblk = tile // S
            sb = scores.reshape(q, nblk, S)
            bd = jnp.min(sb, axis=2)                       # [q, nblk]
            bi = jnp.argmin(sb, axis=2).astype(jnp.int32)  # [q, nblk]
            blk_ids = (off + S * jax.lax.broadcasted_iota(
                jnp.int32, (q, nblk), 1)) + bi
            kk = min(k, nblk)
            neg, pos = jax.lax.top_k(-bd, kk)
            cd = -neg
            ci = jnp.take_along_axis(blk_ids, pos, axis=1)
            return _merge_topk(run_d, run_i, cd, ci, k), None
        if approx:
            # per-tile candidate pre-selection via PartialReduce, then an
            # exact (k + k)-wide merge into the running top-k
            cd, ci = jax.lax.approx_min_k(scores, k, recall_target=0.99)
            ids = jnp.take_along_axis(ids, ci, axis=1)
            return _merge_topk(run_d, run_i, cd, ids, k), None
        return _merge_topk(run_d, run_i, scores, ids, k), None

    (out_d, out_i), _ = jax.lax.scan(step, (init_d, init_i), (offs, thresh))
    return out_i, out_d


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile", "query_batch", "precision",
                     "approx", "return_dists"))
def knn_device(
    queries: jnp.ndarray,  # [Q, D] device-resident; Q % query_batch == 0
    base: jnp.ndarray,     # [N, D] device-resident
    *,
    k: int,
    metric: Metric,
    tile: int = 8192,
    query_batch: int = 8192,
    precision=Precision.HIGHEST,
    approx: bool = False,
    return_dists: bool = True,
):
    """Whole-sweep k-NN as ONE dispatch: an outer ``lax.scan`` over query
    batches around :func:`knn_tiled`'s base-tile scan. Through a high-RTT
    device relay the per-batch host loop in :func:`knn` pays hundreds of
    round-trips per GT call (~30 min per 5M-query shard at 10M scale);
    this runs the identical computation device-side and returns device
    arrays (ids [Q, k] int32, dists [Q, k] f32) fetched by the caller in
    one transfer."""
    q, d_dim = queries.shape
    if q % query_batch:
        raise ValueError(f"Q={q} must be a multiple of query_batch="
                         f"{query_batch} (pad the query set)")
    nb = q // query_batch
    qs = queries.reshape(nb, query_batch, d_dim)

    def step(_, qb):
        ids, dists = knn_tiled(qb, base, k=k, metric=metric, tile=tile,
                               precision=precision, approx=approx)
        # ids-only when dists aren't wanted: the stacked [Q, k] f32 output
        # is 2 GB of dead HBM at the 5M-query GT call
        return _, (ids if not return_dists else (ids, dists))

    _, out = jax.lax.scan(step, None, qs)
    if not return_dists:
        return out.reshape(q, k), None
    ids, dists = out
    return (ids.reshape(q, k), dists.reshape(q, k))


def knn(
    queries,
    base,
    k: int,
    metric: Metric | str,
    *,
    tile: int = 8192,
    query_batch: int = 4096,
    precision=Precision.HIGHEST,
    approx: bool = False,
    return_dists: bool = True,
):
    """Host-facing exact k-NN: loops query batches on the host (each batch is
    one jitted TPU sweep over the full base, dispatched ahead so device work
    overlaps the result fetches). Returns numpy
    (ids ``[Q, k]`` uint32, scores ``[Q, k]`` f32).

    ``queries`` may be a device-resident ``jax.Array``: batches are then
    sliced on device instead of re-uploaded per batch — through a high-RTT
    device relay the per-batch H2D uploads otherwise dominate the whole
    sweep (4 GB per 5M-query GT call at D=200). ``return_dists=False``
    additionally skips the D2H fetch of the score halves (the build consumes
    only ids, matching the reference's ``README.md:64`` note) and returns
    ``(ids, None)``.

    This is the drop-in replacement for the DiskANN ``compute_groundtruth``
    pipeline step (``README.md:69-74``): write its output with
    :func:`roargraph_tpu.io.save_gt` to get a bit-compatible gt file.
    ``approx`` — see :func:`knn_tiled`."""
    metric = Metric.parse(metric)
    dev_q = isinstance(queries, jax.Array)
    if not dev_q:
        queries = np.asarray(queries)
    base_dev = jnp.asarray(base)
    q = queries.shape[0]
    if dev_q:
        # device-resident queries: the whole sweep is ONE dispatch and one
        # result fetch (see knn_device) — the host-batched loop below costs
        # per-batch relay round-trips
        # Host loop over GROUPS of query batches: each group is one
        # knn_device dispatch over a device-side slice (no re-upload), big
        # enough to amortize the relay RTT, small enough that no single
        # program runs for minutes (a whole-sweep megadispatch at 10M scale
        # crashed the TPU worker through the tunnel). ROAR_GT_GROUP tunes
        # batches-per-dispatch for flaky tunnels.
        # Default 2 batches/dispatch: the tunnel's worker also dies under
        # single programs in the tens-of-seconds range at 10M-scale sweeps
        # (observed 2026-08-17: repeated UNAVAILABLE crashes during shard GT
        # at group=8; the shorter programs also shrink the work lost per
        # crash). Raise for stable direct-attached devices.
        group = query_batch * int(os.environ.get("ROAR_GT_GROUP", "2"))
        out_ids = np.empty((q, k), dtype=np.uint32)
        out_d = np.empty((q, k), dtype=np.float32) if return_dists else None
        pending = []
        last_msg = time.time()

        def _drain_dev(item):
            nonlocal last_msg
            s, e, ids, d = item
            out_ids[s:e] = np.asarray(ids)[: e - s].astype(np.uint32)
            if return_dists:
                out_d[s:e] = np.asarray(d)[: e - s]
            if time.time() - last_msg > 120:  # liveness for watchdogged runs
                print(f"knn: {e}/{q}", file=sys.stderr, flush=True)
                last_msg = time.time()

        for s in range(0, q, group):
            e = min(s + group, q)
            qb = jax.lax.slice_in_dim(queries, s, e)
            gp = (-(e - s)) % query_batch
            if gp:
                qb = jnp.pad(qb, ((0, gp), (0, 0)))
            ids, d = knn_device(qb, base_dev, k=k, metric=metric, tile=tile,
                                query_batch=min(query_batch, qb.shape[0]),
                                precision=precision, approx=approx,
                                return_dists=return_dists)
            pending.append((s, e, ids, d))
            if len(pending) > 2:
                _drain_dev(pending.pop(0))
        for item in pending:
            _drain_dev(item)
        return out_ids, out_d
    out_ids = np.empty((q, k), dtype=np.uint32)
    out_d = np.empty((q, k), dtype=np.float32) if return_dists else None
    pending = []
    last_msg = time.time()

    def _drain(item):
        nonlocal last_msg
        s, e, ids, d = item
        out_ids[s:e] = np.asarray(ids)[: e - s].astype(np.uint32)
        if return_dists:
            out_d[s:e] = np.asarray(d)[: e - s]
        if time.time() - last_msg > 120:  # liveness for watchdogged runs
            print(f"knn: {e}/{q}", file=sys.stderr, flush=True)
            last_msg = time.time()

    # Bounded pipeline depth: dispatch ahead so device work overlaps result
    # fetches, but drain the oldest pending batch past a small window so the
    # resident footprint stays O(window * batch) instead of O(q) — at the
    # 2.5M-train GT call an unbounded pipeline kept ~4 GB of inputs+outputs
    # live on device simultaneously.
    window = 4
    for s in range(0, q, query_batch):
        e = min(s + query_batch, q)
        qb = queries[s:e]
        if e - s < query_batch and q > query_batch:
            pad = query_batch - (e - s)
            qb = np.concatenate([qb, np.zeros((pad, qb.shape[1]), qb.dtype)])
        ids, d = knn_tiled(jnp.asarray(qb), base_dev, k=k, metric=metric,
                           tile=tile, precision=precision, approx=approx)
        pending.append((s, e, ids, d))
        if len(pending) > window:
            _drain(pending.pop(0))
    for item in pending:
        _drain(item)
    return out_ids, out_d
