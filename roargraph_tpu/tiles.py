"""Tile-graph serving engine — the TPU-native redesign of the query hot path.

The reference's unit of navigation is a single vector because a CPU does
cheap scalar loads: ``SearchRoarGraph`` walks node by node, prefetching one
800-byte vector at a time (``src/index_bipartite.cpp:2356-2404``,
``:2374-2375``). On TPU the economics invert — random row gathers run at a
few percent of HBM bandwidth (measured ~18 ns/element, DESIGN.md) while
sequential block reads + MXU contractions run near speed of light. The
TPU-native navigation unit is therefore an **MXU tile**: the base set is
partitioned into fixed-size clusters stored contiguously; search walks a
small graph over *clusters* and scores a whole cluster with one batched
contraction per expansion.

Cross-modal navigability — the point of RoarGraph — is inherited, not
discarded: the cluster adjacency aggregates the vector-level projection
edges (built from training-query groundtruth, ``LinkProjection``
``src/index_bipartite.cpp:1043-1277``), so the learned query→base match
structure still drives navigation; the centroid ranking only orders the
frontier. ``use_graph=False`` degenerates to plain IVF probing (centroid
ranking alone) for A/B comparison.

Scores are exact within each scanned cluster (same distance kernels as the
flat engine), so recall is a pure function of *which* clusters get scanned.

Counters: ``cmps`` = vectors scored (analog of the reference's distance
comparisons, ``:2419``), ``hops`` = clusters expanded.
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from .config import Metric
from .graph import PAD, PaddedGraph
from .ops.distance import pairwise_scores

BIG = jnp.int32(2**31 - 1)


# ---------------------------------------------------------------------------
# Pallas fused frontier-scan kernel
# ---------------------------------------------------------------------------
#
# The XLA formulation of the per-hop cluster scan (`tiles[f]` gather then
# dot) materializes a [B, C, D] buffer in HBM: one pass to write the gather,
# one to read it back into the MXU — 3x the bytes of the tiles themselves.
# This kernel streams each query's frontier cluster HBM→VMEM with
# double-buffered async DMA (pallas_guide.md pattern) and contracts it
# against the query entirely in VMEM, so every tile byte crosses HBM exactly
# once. The scan layout is transposed+padded `[K, D_pad, C]`: the DMA'd
# slice's minor dims (D_pad sublanes, C lanes) are tile-aligned, and
# `[1, D_pad] @ [D_pad, C]` is a direct MXU contraction.

def _pad_d(D: int) -> int:
    return -(-D // 32) * 32


_GQ = 8  # queries per grid step (sublane tile); even → DMA parity carries


def _scan_kernel(f_ref, q_ref, tiles_ref, out_ref, scratch, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    nq = pl.num_programs(0) * _GQ

    def get_dma(slot, b):
        return pltpu.make_async_copy(tiles_ref.at[f_ref[b]],
                                     scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    base = i * _GQ
    rows = []
    for j in range(_GQ):  # static unroll: all slices below are static
        b = base + j

        @pl.when(b + 1 < nq)
        def _():
            get_dma((j + 1) % 2, b + 1).start()

        get_dma(j % 2, b).wait()
        tile = scratch[j % 2]                             # [Dp, C]
        rows.append(jax.lax.dot_general(
            q_ref[j:j + 1, :], tile.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))          # [1, C]
    out_ref[:, :] = jnp.concatenate(rows, axis=0)


def _scan_clusters_pallas(tiles_t, f, queries, *, interpret: bool = False):
    """dots[b, :] = queries[b] @ tiles_t[f[b]] — [B, C] f32, one HBM pass.

    ``tiles_t``: [K, D_pad, C] (see :func:`upload`); ``queries`` [B, D_pad]
    f32, B a multiple of 8. On real hardware C must be a multiple of 128
    (lane tiling)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Dp, C = tiles_t.shape
    B = queries.shape[0]
    if not interpret and C % 128:
        raise ValueError(f"pallas scan needs cluster_size % 128 == 0, "
                         f"got {C}")
    if B % _GQ:
        raise ValueError(f"pallas scan needs batch % {_GQ} == 0, got {B}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // _GQ,),
        in_specs=[
            pl.BlockSpec((_GQ, Dp), lambda i, f_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((_GQ, C), lambda i, f_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Dp, C), tiles_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * Dp,
            bytes_accessed=B * C * Dp * tiles_t.dtype.itemsize + B * C * 4,
            transcendentals=0),
    )(f, queries, tiles_t)


# ---------------------------------------------------------------------------
# Index container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TileIndex:
    """Base vectors reordered into K fixed-size clusters + a cluster graph.

    - ``tiles``     [K, C, D]  vectors, contiguous per cluster (pad slots 0)
    - ``gids``      [K, C] int32 original base ids (PAD for pad slots)
    - ``centroids`` [K, D] cluster means (f32)
    - ``adj``       [K, Mc] int32 cluster adjacency (PAD-filled), built from
                    the RoarGraph's vector-level edges
    - ``ep``        int, entry cluster (cluster of the graph medoid)
    - ``radii``     [K] f32 max member distance to centroid — the per-cluster
                    term of the early-exit score bound
                    (``score(q, x) >= s_centroid - |q| * R`` by
                    Cauchy-Schwarz for IP/cosine; the L2 analog squares).
    - ``scales``    [K] f32, present iff ``tiles`` are int8-quantized
                    (:meth:`quantize_int8`): dequant = tiles * scales[k].
    """
    tiles: np.ndarray
    gids: np.ndarray
    centroids: np.ndarray
    adj: np.ndarray
    ep: int
    radii: np.ndarray | None = None
    scales: np.ndarray | None = None

    @property
    def num_clusters(self) -> int:
        return self.tiles.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.tiles.shape[1]

    def save_npz(self, path: str) -> None:
        extra = {} if self.radii is None else dict(radii=self.radii)
        if self.scales is not None:
            extra["scales"] = self.scales
        # compression is single-core zlib at ~tens of MB/s: a multi-GB tile
        # cache (10M-scale) would sit silent for the better part of an hour
        # under a stall watchdog — store big caches raw (vector data barely
        # compresses; load_npz reads either format)
        save = (np.savez_compressed if self.tiles.nbytes < (1 << 28)
                else np.savez)
        save(path, tiles=self.tiles, gids=self.gids,
             centroids=self.centroids, adj=self.adj,
             ep=np.int64(self.ep), **extra)

    @staticmethod
    def load_npz(path: str) -> "TileIndex":
        with np.load(path) as z:
            return TileIndex(z["tiles"], z["gids"], z["centroids"],
                             z["adj"], int(z["ep"]),
                             radii=z["radii"] if "radii" in z else None,
                             scales=z["scales"] if "scales" in z else None)

    def with_radii(self) -> "TileIndex":
        """Compute ``radii`` from tiles/centroids if absent (old caches).
        Chunked over clusters — the [K, C, D] f32 residual would be ~12 GB
        at 10M shapes in one shot."""
        if self.radii is not None:
            return self
        K = self.tiles.shape[0]
        out = np.zeros(K, np.float32)
        CH = max(1, (1 << 28) // max(self.tiles.shape[1]
                                     * self.tiles.shape[2] * 4, 1))
        last_msg = time.time()
        for s in range(0, K, CH):
            e = min(s + CH, K)
            t = self.tiles[s:e].astype(np.float32)
            if self.scales is not None:
                t = t * self.scales[s:e, None, None]
            diff = t - self.centroids[s:e, None, :]
            r = np.sqrt(np.maximum((diff * diff).sum(axis=2), 0))
            r = np.where(self.gids[s:e] != PAD, r, 0.0)
            out[s:e] = r.max(axis=1)
            if time.time() - last_msg > 120:  # watchdog liveness
                print(f"with_radii: {e}/{K}", file=sys.stderr, flush=True)
                last_msg = time.time()
        return dataclasses.replace(self, radii=out)

    def astype(self, dtype) -> "TileIndex":
        """Cast tile storage (e.g. bfloat16 halves scan bytes; scores then
        accumulate in f32 via ``preferred_element_type``)."""
        if str(dtype) == "int8":
            return self.quantize_int8()
        if self.scales is not None:
            raise ValueError("TileIndex is int8-quantized; cannot recast")
        return dataclasses.replace(self, tiles=self.tiles.astype(dtype))

    def quantize_int8(self) -> "TileIndex":
        """Per-cluster symmetric int8 quantization of the tile storage:
        ``scales[k] = max|tiles[k]| / 127``, stored value = round(x/scale).
        Halves scan bytes vs bf16 (quarters vs f32) — the per-hop cluster
        scan is the tile engine's HBM floor (DESIGN.md hop anatomy), so the
        byte cut is a near-proportional QPS lever. Scores are descaled to
        absolute units inside :func:`tile_search_batch`, so the running
        top-k merge across clusters stays exact up to quantization noise
        (relative err ~ 1/254 per coordinate, mean-zero over a 200-d dot).
        Computes ``radii`` first (they need the unquantized values)."""
        if self.scales is not None:
            return self
        idx = self.with_radii()
        K, C, D = idx.tiles.shape
        scales = np.zeros(K, np.float32)
        q = np.zeros((K, C, D), np.int8)
        CH = max(1, (1 << 28) // max(C * D * 4, 1))  # chunk the f32 temp
        last_msg = time.time()
        for s in range(0, K, CH):
            e = min(s + CH, K)
            t = idx.tiles[s:e].astype(np.float32)
            maxabs = np.abs(t).reshape(e - s, -1).max(axis=1)
            sc = (np.maximum(maxabs, 1e-30) / 127.0).astype(np.float32)
            scales[s:e] = sc
            q[s:e] = np.clip(np.rint(t / sc[:, None, None]),
                             -127, 127).astype(np.int8)
            if time.time() - last_msg > 120:  # watchdog liveness
                print(f"quantize_int8: {e}/{K}", file=sys.stderr, flush=True)
                last_msg = time.time()
        return dataclasses.replace(idx, tiles=q, scales=scales)


# ---------------------------------------------------------------------------
# Build: balanced clustering + cluster graph from RoarGraph edges
# ---------------------------------------------------------------------------

def _greedy_rounds(assign: np.ndarray, used: np.ndarray, cap: int,
                   todo: np.ndarray, choice_ids: np.ndarray,
                   choice_d: np.ndarray) -> np.ndarray:
    """Capacity-respecting greedy rounds: round j offers every still-
    unassigned point (rows of ``todo``) its j-th choice; within a round,
    closer points win the remaining slots (rank-within-cluster via one
    lexsort). Mutates ``assign``/``used``; returns the still-unassigned
    subset of ``todo``."""
    pos = np.arange(todo.size)
    for j in range(choice_ids.shape[1]):
        rem = pos[assign[todo] < 0]
        if rem.size == 0:
            break
        c = choice_ids[rem, j]
        d = choice_d[rem, j]
        order = np.lexsort((d, c))
        c_s, rem_s = c[order], rem[order]
        is_first = np.empty(c_s.size, bool)
        is_first[0] = True
        is_first[1:] = c_s[1:] != c_s[:-1]
        idx = np.arange(c_s.size)
        first_idx = np.maximum.accumulate(np.where(is_first, idx, 0))
        rank = idx - first_idx
        ok = used[c_s] + rank < cap
        assign[todo[rem_s[ok]]] = c_s[ok]
        used += np.bincount(c_s[ok], minlength=used.size)
    return todo[assign[todo] < 0]


def _balanced_assign(base: np.ndarray, n_clusters: int, cap: int, *,
                     iters: int = 6, seed: int = 0,
                     n_choices: int = 8) -> np.ndarray:
    """Capacity-constrained k-means assignment: every cluster gets at most
    ``cap`` members. Returns assign [N] int64.

    Vectorized greedy rounds over each point's ``n_choices`` nearest
    centroids; points left over when all their choices are full go through
    spill passes (re-kNN against only the clusters with free capacity) so
    every point still lands in the nearest cluster that can take it —
    arbitrary-slot filling is the last resort only. At 10M-scale the
    demand distribution over sample-trained centroids is skewed enough
    that 8 choices strand ~45% of points (measured, t2i-10M); the choice
    list is widened at large N instead.
    """
    from .ops.seeds import _kmeans
    from .ops.topk import knn

    n = base.shape[0]
    # At very large N the k-means objective is already saturated by a
    # subsample (loss is per-centroid-local); training on all N points would
    # cost iters * N * K * D flops — hours at 10M/56k centroids. Train on a
    # bounded sample, assign all N once below. Small/medium N keep the exact
    # full-data path (bit-identical to previous builds).
    SAMPLE_GATE = 3_000_000
    if n > SAMPLE_GATE:
        samp = max(1_000_000, 20 * n_clusters)
        sel = np.random.default_rng(seed).choice(n, size=min(samp, n),
                                                 replace=False)
        train = base[np.sort(sel)]
    else:
        train = base
    from .ops.seeds import _assign_chunk
    t0 = time.time()
    cents = np.asarray(_kmeans(jnp.asarray(train), jax.random.PRNGKey(seed),
                               n_centroids=n_clusters, iters=iters,
                               chunk=_assign_chunk(train.shape[0],
                                                   n_clusters)))
    if time.time() - t0 > 5:
        print(f"_balanced_assign: kmeans {time.time() - t0:.0f}s "
              f"(K={n_clusters}, train={train.shape[0]})",
              file=sys.stderr, flush=True)
    big = n > SAMPLE_GATE
    if big:
        # skewed demand over sample-trained centroids: widen the choice
        # list so dense-region points see past their oversubscribed
        # neighborhoods (measured at t2i-10M: 8 choices strand 45% of
        # points; host memory cost is n * n_choices * 12 bytes)
        n_choices = max(n_choices, 64)
    n_choices = min(n_choices, n_clusters)
    # per-point closest centroids (tiled on device); at large N use bf16
    # multiplies + per-tile approx selection — assignment choices tolerate
    # tail-order noise, and f32-precision selection alone would dominate
    # the whole tile build at 10M
    t0 = time.time()
    choice_ids, choice_d = knn(
        base, cents, k=n_choices, metric=Metric.L2,
        precision=(jax.lax.Precision.DEFAULT if big
                   else jax.lax.Precision.HIGHEST),
        approx=big)
    if time.time() - t0 > 5:
        print(f"_balanced_assign: choice knn {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
    choice_ids = choice_ids.astype(np.int64)

    assign = np.full(n, -1, np.int64)
    used = np.zeros(n_clusters, np.int64)
    todo = _greedy_rounds(assign, used, cap, np.arange(n, dtype=np.int64),
                          choice_ids, choice_d)
    # spill passes: points whose every choice filled up re-rank against
    # only the clusters that still have room, so they land in the nearest
    # cluster that can take them (capacity >= n by construction)
    for _ in range(4):
        if todo.size == 0:
            break
        free = np.flatnonzero(used < cap)
        if free.size == 0:
            break
        print(f"_balanced_assign: spill pass for {todo.size} points over "
              f"{free.size} free clusters", file=sys.stderr, flush=True)
        sub_ids, sub_d = knn(
            np.ascontiguousarray(base[todo]), cents[free],
            k=min(8, free.size), metric=Metric.L2,
            precision=(jax.lax.Precision.DEFAULT if big
                       else jax.lax.Precision.HIGHEST),
            approx=big and free.size > 4096)
        before = todo.size
        todo = _greedy_rounds(assign, used, cap, todo,
                              free[sub_ids.astype(np.int64)], sub_d)
        if todo.size == before:
            break
    if todo.size:
        free = cap - used
        slots = np.repeat(np.arange(n_clusters), np.maximum(free, 0))
        assign[todo] = slots[: todo.size]
        # Assignment-quality observability: points placed outside their
        # choice lists are a silent recall risk that grows with occupancy
        # pressure — surface the count and the distance penalty instead
        # of hiding it.
        d_got = np.linalg.norm(base[todo] - cents[assign[todo]], axis=1)
        d_want = np.sqrt(np.maximum(choice_d[todo, 0], 0))
        print(f"_balanced_assign: {todo.size}/{n} points "
              f"({100.0 * todo.size / n:.2f}%) placed arbitrarily after "
              f"spill passes; mean dist {d_got.mean():.3f} vs nearest "
              f"{d_want.mean():.3f}", file=sys.stderr, flush=True)
    return assign


def build_tiles(graph: PaddedGraph, base, *, cluster_size: int = 512,
                Mc: int = 32, metric: Metric | str = Metric.IP,
                kmeans_iters: int = 6, seed: int = 0,
                centroid_knn_edges: int = 4,
                fill: float = 0.75) -> TileIndex:
    """Build the tile index over an existing RoarGraph.

    Cluster adjacency = per source cluster, the ``Mc`` clusters receiving the
    most vector-level RoarGraph edges (symmetrized), unioned with each
    cluster's ``centroid_knn_edges`` nearest centroids as a geometric backstop
    so sparse regions stay reachable.

    ``fill`` targets the average cluster occupancy: clusters hold up to
    ``cluster_size`` rows but only ``fill`` of the capacity is needed on
    average, so the capacity-constrained assignment rarely has to push a
    point away from its nearest centroid (tight capacity measurably costs
    recall). Lower fill = better assignment, more padded scan compute.
    """
    from .ops.topk import knn

    Metric.parse(metric)
    base = np.asarray(base)
    N, D = base.shape
    C = int(cluster_size)
    K = max(1, -(-N // max(1, int(C * fill))))
    big = N > 3_000_000  # stage liveness prints for watchdogged drivers
    assign = _balanced_assign(base, K, C, iters=kmeans_iters, seed=seed)
    if big:
        print("build_tiles: assignment done", file=sys.stderr, flush=True)

    # ---- reorder into tiles ------------------------------------------------
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=K)
    gids = np.full((K, C), PAD, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for kk in range(K):
        m = counts[kk]
        gids[kk, :m] = order[starts[kk]: starts[kk] + m]
    tiles = np.zeros((K, C, D), base.dtype)
    valid = gids != PAD
    tiles[valid] = base[gids[valid]]
    centroids = np.zeros((K, D), np.float32)
    nz = counts > 0
    sums = np.zeros((K, D), np.float64)
    # chunked accumulation: base.astype(f64) alone is 2x N*D*8 bytes at once
    CH = max(1, (1 << 27) // max(D, 1))
    for s in range(0, N, CH):
        np.add.at(sums, assign[s: s + CH],
                  base[s: s + CH].astype(np.float64))
    centroids[nz] = (sums[nz] / counts[nz, None]).astype(np.float32)
    if big:
        print("build_tiles: tiles+centroids done", file=sys.stderr,
              flush=True)

    # ---- cluster graph from vector-level RoarGraph edges -------------------
    src_c = np.repeat(assign, graph.ids.shape[1])
    dst = graph.ids.ravel().astype(np.int64)
    ok = dst != PAD
    src_c, dst = src_c[ok], dst[ok]
    dst_c = assign[dst]
    cross = src_c != dst_c
    src_c, dst_c = src_c[cross], dst_c[cross]
    # symmetrize: co-access is direction-free at cluster granularity
    a = np.concatenate([src_c, dst_c])
    b = np.concatenate([dst_c, src_c])
    keys, cnt = np.unique(a * K + b, return_counts=True)
    e_src, e_dst = keys // K, keys % K
    if big:
        print("build_tiles: edge aggregation done", file=sys.stderr,
              flush=True)
    # top-Mc destinations per source by edge count (desc), count ties by id
    o = np.lexsort((e_dst, -cnt, e_src))
    e_src, e_dst = e_src[o], e_dst[o]
    is_first = np.empty(e_src.size, bool)
    if e_src.size:
        is_first[0] = True
        is_first[1:] = e_src[1:] != e_src[:-1]
    idx = np.arange(e_src.size)
    rank = idx - np.maximum.accumulate(np.where(is_first, idx, 0))
    keep = rank < Mc
    adj = np.full((K, Mc), PAD, np.int32)
    adj[e_src[keep], rank[keep]] = e_dst[keep].astype(np.int32)

    # geometric backstop edges (nearest centroids, excluding self) —
    # vectorized: at 10M-scale K is ~50k+ and a per-cluster Python loop is
    # interpreter-bound
    if K > 1 and centroid_knn_edges > 0:
        nn_ids, _ = knn(centroids, centroids,
                        k=min(centroid_knn_edges + 1, K), metric=Metric.L2)
        nn_ids = nn_ids.astype(np.int64)                    # [K, E1]
        E1 = nn_ids.shape[1]
        rows = np.broadcast_to(np.arange(K)[:, None], (K, E1))
        ok = (nn_ids != rows) & ~(
            nn_ids[:, :, None] == adj[:, None, :].astype(np.int64)
        ).any(axis=2)
        rank = np.cumsum(ok, axis=1) - 1
        deg = (adj != PAD).sum(axis=1)
        slot = deg[:, None] + rank
        put = ok & (slot < Mc)
        adj[rows[put], slot[put]] = nn_ids[put].astype(np.int32)

    ep = int(assign[graph.ep])
    return TileIndex(tiles=tiles, gids=gids, centroids=centroids, adj=adj,
                     ep=ep).with_radii()


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------

def _num_groups(K: int, B: int, nq_max: int) -> int:
    """Tight static bound on the number of query groups: sum_c ceil(n_c/nq)
    <= (distinct clusters in f) + B/nq <= min(K, B) + ceil(B/nq). The old
    K-based bound made the grouped scan's staging buffers O(K) — multi-GB at
    10M-scale K where at most B groups can ever be non-empty."""
    return min(K, B) + -(-B // nq_max)


def _group_queries(f, B, K, G, nq_max):
    """Cluster-grouping index math shared by the grouped scan impls.

    Returns ``(tile_of [G], src [G*nq_max], pos_q [B])``: group g scans
    cluster ``tile_of[g]``; slot j of group g holds query ``src[g*nq+j]``;
    query b's scores land at flat position ``pos_q[b]``."""
    ord_ = jnp.argsort(f, stable=True)
    fs = f[ord_]
    idx = jnp.arange(B, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
    firstidx = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - firstidx
    boundary = first | (rank % nq_max == 0)
    row = jnp.cumsum(boundary.astype(jnp.int32)) - 1         # [B] in [0, G)
    slot = rank % nq_max
    tile_of = jnp.zeros((G,), jnp.int32).at[row].max(fs)
    # Staging via row-GATHERS driven by two tiny int32 scatters: TPU scatters
    # of [*, Dp]-row payloads serialize read-modify-write per row, while the
    # equivalent gathers stream. Pad slots read qp[0] (src init 0); their dot
    # outputs are never referenced by pos_q below.
    pos = row * nq_max + slot                                # [B], ord_ order
    src = jnp.zeros((G * nq_max,), jnp.int32).at[pos].set(ord_)
    pos_q = jnp.zeros((B,), jnp.int32).at[ord_].set(pos)
    return tile_of, src, pos_q


def _scan_clusters_grouped(tiles_t, f, qp, *, nq_max: int = 64):
    """dots[b, :] = qp[b] @ tiles_t[f[b]] via cluster-grouped batched matmul.

    At serving batch sizes many queries share a frontier cluster (B >> K), so
    per-query tile reads are redundant. Group queries by cluster on device
    (stable sort + rank), pad each cluster's queries to rows of ``nq_max``
    (hot clusters get multiple rows), and compute ONE batched [G, nq_max, Dp]
    x [G, Dp, C] MXU contraction. G = K + B//nq_max is static; each tile is
    read ~once per hop instead of once per query. Exactly the same per-query
    scores as the per-query paths (same dot, same tile)."""
    K, Dp, C = tiles_t.shape
    B = qp.shape[0]
    G = _num_groups(K, B, nq_max)
    tile_of, src, pos_q = _group_queries(f, B, K, G, nq_max)
    Q = qp[src].reshape(G, nq_max, Dp)
    tg = tiles_t[tile_of]                                    # [G, Dp, C]
    if tg.dtype == jnp.int8:
        tg = tg.astype(jnp.bfloat16)  # exact for ±127; fuses into the dot
    sg = jax.lax.dot_general(
        Q, tg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [G, nq_max, C]
    return sg.reshape(G * nq_max, C)[pos_q]                  # [B, C]


def _select_topp(dots, ids_row, p, beta_row=None):
    """In-kernel per-row top-p selection (smallest score first).

    ``dots`` [nq, C] f32 raw inner products, ``ids_row`` [C] int32 global
    ids (PAD marks dead slots). Score: ``-dots`` (IP/cosine) or
    ``beta_row - 2*dots`` when ``beta_row`` ([C] f32 — the L2 norms row;
    the per-query ``|q|^2`` constant is rank-neutral and added outside).
    Returns ([nq, p] f32 scores, [nq, p] int32 global ids, BIG when
    exhausted). Iterative min+mask — p tiny VPU reduces; no argmin/sort
    primitives, so it lowers on TPU Pallas. Ties break toward the lower
    lane index, like a left-to-right scan."""
    nq, C = dots.shape
    sc = (-dots if beta_row is None
          else beta_row[None, :] - 2.0 * dots)
    v = jnp.where((ids_row != PAD)[None, :], sc, jnp.inf)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nq, C), 1)
    vals, oids = [], []
    for _ in range(p):
        m = jnp.min(v, axis=1)                               # [nq]
        am = jnp.min(jnp.where(v <= m[:, None], iota, C), axis=1)
        oh = iota == am[:, None]
        gid = jnp.sum(jnp.where(oh, ids_row[None, :], 0), axis=1)
        # literal, not the module-level jnp constant: a captured jnp array
        # would be a pallas "captured constant" error
        gid = jnp.where(m == jnp.inf, np.int32(2**31 - 1), gid)
        vals.append(m)
        oids.append(gid)
        v = jnp.where(oh, jnp.inf, v)
    return jnp.stack(vals, axis=1), jnp.stack(oids, axis=1)


def _scan_fused_kernel(f_ref, q_ref, gids_ref, *rest, p, l2):
    """Per-query scan + in-VMEM top-p: _scan_kernel that never writes the
    [B, C] dots to HBM — each grid step emits only its _GQ queries'
    [p]-wide candidate lists (scores + global ids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if l2:
        norms_ref, tiles_ref, outv_ref, outi_ref, scratch, sems = rest
    else:
        tiles_ref, outv_ref, outi_ref, scratch, sems = rest
        norms_ref = None
    i = pl.program_id(0)
    nq = pl.num_programs(0) * _GQ

    def get_dma(slot, b):
        return pltpu.make_async_copy(tiles_ref.at[f_ref[b]],
                                     scratch.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(0, 0).start()

    base = i * _GQ
    for j in range(_GQ):  # static unroll: all slices below are static
        b = base + j

        @pl.when(b + 1 < nq)
        def _():
            get_dma((j + 1) % 2, b + 1).start()

        get_dma(j % 2, b).wait()
        tile = scratch[j % 2]                                # [Dp, C]
        dots = jax.lax.dot_general(
            q_ref[j:j + 1, :], tile.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [1, C]
        vals, oids = _select_topp(
            dots, gids_ref[j], p,
            beta_row=None if norms_ref is None else norms_ref[j])
        outv_ref[j, :] = vals[0]
        outi_ref[j, :] = oids[0]


def _scan_clusters_pallas_fused(tiles_t, gids, f, queries, *, p: int,
                                norms=None, interpret: bool = False):
    """Fused per-query scan+select: returns ([B, p] f32 scores, [B, p] int32
    global ids) — the hop's candidates pre-reduced from C to p inside the
    kernel, so the running top-k merge shrinks ~C/p-fold and the [B, C]
    dots/ids never exist in HBM. Scores: ``-dot`` (IP/cosine) or
    ``|x|^2 - 2<q,x>`` when ``norms`` [K, C] is given (L2 minus the
    rank-neutral ``|q|^2``, added by the caller)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Dp, C = tiles_t.shape
    B = queries.shape[0]
    if not interpret and C % 128:
        raise ValueError(f"pallas scan needs cluster_size % 128 == 0, "
                         f"got {C}")
    if B % _GQ:
        raise ValueError(f"pallas scan needs batch % {_GQ} == 0, got {B}")
    gids_f = gids[f]                                         # [B, C] i32
    l2 = norms is not None

    row_spec = pl.BlockSpec((_GQ, C), lambda i, f_ref: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((_GQ, Dp), lambda i, f_ref: (i, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    operands = [f, queries, gids_f]
    if l2:
        in_specs.append(row_spec)
        operands.append(norms[f].astype(jnp.float32))        # [B, C] f32
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # tiles stay in HBM
    operands.append(tiles_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // _GQ,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((_GQ, p), lambda i, f_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_GQ, p), lambda i, f_ref: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Dp, C), tiles_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_scan_fused_kernel, p=p, l2=l2),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, p), jnp.float32),
                   jax.ShapeDtypeStruct((B, p), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * C * Dp,
            bytes_accessed=(B * C * Dp * tiles_t.dtype.itemsize
                            + B * C * 4 + 2 * B * p * 4),
            transcendentals=0),
    )(*operands)


def _scan_group_fused_kernel(tile_of_ref, q_ref, gids_ref, *rest, p, l2):
    """Grouped scan + in-VMEM top-p: _scan_group_kernel without the
    [G, nq, C] HBM staging — each group emits [nq, p] candidates."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if l2:
        norms_ref, tiles_ref, outv_ref, outi_ref, scratch, sems = rest
    else:
        tiles_ref, outv_ref, outi_ref, scratch, sems = rest
        norms_ref = None
    g = pl.program_id(0)
    nG = pl.num_programs(0)

    def get_dma(slot, gg):
        return pltpu.make_async_copy(tiles_ref.at[tile_of_ref[gg]],
                                     scratch.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(g + 1 < nG)
    def _():
        get_dma((g + 1) % 2, g + 1).start()

    get_dma(g % 2, g).wait()
    tile = scratch[g % 2]                                    # [Dp, C]
    dots = jax.lax.dot_general(
        q_ref[0], tile.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [nq, C]
    vals, oids = _select_topp(
        dots, gids_ref[0], p,
        beta_row=None if norms_ref is None else norms_ref[0])
    outv_ref[0] = vals
    outi_ref[0] = oids


def _scan_clusters_grouped_pallas_fused(tiles_t, gids, f, qp, *, p: int,
                                        norms=None, nq_max: int = 64,
                                        interpret: bool = False):
    """Fused grouped scan+select: ([B, p] f32 scores, [B, p] i32 global
    ids). The grouped XLA path's [G, nq, C] staging (the dominant HBM
    traffic once G ~ B) shrinks to [G, nq, p]. Score form as in
    :func:`_scan_clusters_pallas_fused`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Dp, C = tiles_t.shape
    B = qp.shape[0]
    if not interpret and C % 128:
        raise ValueError(f"grouped_pallas scan needs cluster_size % 128 "
                         f"== 0, got {C}")
    G = _num_groups(K, B, nq_max)
    tile_of, src, pos_q = _group_queries(f, B, K, G, nq_max)
    Q = qp[src].reshape(G, nq_max, Dp)
    gids_g = gids[tile_of]                                   # [G, C] i32
    l2 = norms is not None

    row_spec = pl.BlockSpec((1, C), lambda g, tf_ref: (g, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, nq_max, Dp), lambda g, tf_ref: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
    ]
    operands = [tile_of, Q, gids_g]
    if l2:
        in_specs.append(row_spec)
        operands.append(norms[tile_of].astype(jnp.float32))  # [G, C] f32
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # tiles stay in HBM
    operands.append(tiles_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nq_max, p), lambda g, tf_ref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_max, p), lambda g, tf_ref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Dp, C), tiles_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    sv, si = pl.pallas_call(
        functools.partial(_scan_group_fused_kernel, p=p, l2=l2),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, nq_max, p), jnp.float32),
                   jax.ShapeDtypeStruct((G, nq_max, p), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * G * nq_max * C * Dp,
            bytes_accessed=(G * Dp * C * tiles_t.dtype.itemsize
                            + G * (nq_max * Dp + C) * 4
                            + 2 * G * nq_max * p * 4),
            transcendentals=0),
    )(*operands)
    return (sv.reshape(G * nq_max, p)[pos_q],
            si.reshape(G * nq_max, p)[pos_q])                # [B, p] x2


def _scan_group_kernel(tile_of_ref, q_ref, tiles_ref, out_ref, scratch,
                       sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    nG = pl.num_programs(0)

    def get_dma(slot, gg):
        return pltpu.make_async_copy(tiles_ref.at[tile_of_ref[gg]],
                                     scratch.at[slot], sems.at[slot])

    @pl.when(g == 0)
    def _():
        get_dma(0, 0).start()

    @pl.when(g + 1 < nG)
    def _():
        get_dma((g + 1) % 2, g + 1).start()

    get_dma(g % 2, g).wait()
    tile = scratch[g % 2]                                    # [Dp, C]
    out_ref[0] = jax.lax.dot_general(
        q_ref[0], tile.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [nq, C]


def _scan_clusters_grouped_pallas(tiles_t, f, qp, *, nq_max: int = 64,
                                  interpret: bool = False):
    """The grouped scan with the tile-gather + contraction fused in a Pallas
    kernel: one grid step per query group, the group's tile DMA'd HBM→VMEM
    (double-buffered) and contracted in VMEM. Eliminates the XLA grouped
    path's ``[G, Dp, C]`` HBM staging buffer (one write + one read of ~2x
    the tile bytes per hop); every tile byte now crosses HBM exactly once
    per *group* touching it. Scores are the same dot as the XLA grouped
    path (cast order included: tile→f32, q f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, Dp, C = tiles_t.shape
    B = qp.shape[0]
    if not interpret and C % 128:
        raise ValueError(f"grouped_pallas scan needs cluster_size % 128 "
                         f"== 0, got {C}")
    G = _num_groups(K, B, nq_max)
    tile_of, src, pos_q = _group_queries(f, B, K, G, nq_max)
    Q = qp[src].reshape(G, nq_max, Dp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, nq_max, Dp), lambda g, tf_ref: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((1, nq_max, C), lambda g, tf_ref: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Dp, C), tiles_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    sg = pl.pallas_call(
        _scan_group_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, nq_max, C), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * G * nq_max * C * Dp,
            bytes_accessed=(G * Dp * C * tiles_t.dtype.itemsize
                            + G * nq_max * (Dp + C) * 4),
            transcendentals=0),
    )(tile_of, Q, tiles_t)
    return sg.reshape(G * nq_max, C)[pos_q]                  # [B, C]


@functools.partial(
    jax.jit,
    static_argnames=("k", "T", "Lc", "metric", "use_graph", "scan_impl",
                     "early_exit", "exit_slack", "nbr_impl", "merge_every",
                     "dedup_impl", "expand_batch"))
def tile_search_batch(
    tiles_t: jnp.ndarray,    # [K, D_pad, C] transposed scan layout (upload())
    gids: jnp.ndarray,       # [K, C] int32
    centroids: jnp.ndarray,  # [K, D]
    adj: jnp.ndarray,        # [K, Mc] int32
    queries: jnp.ndarray,    # [B, D]
    norms: jnp.ndarray | None = None,  # [K, C] |v|^2, required for L2
    adj_cents: jnp.ndarray | None = None,  # [K, Mc, D] pre-gathered neighbor
                             # centroids (upload()); enables the dense
                             # neighbor-score path at large K
    adj_cnorms: jnp.ndarray | None = None,  # [K, Mc] |c|^2 (L2 dense path)
    scales: jnp.ndarray | None = None,  # [K] f32 per-cluster dequant scale
                             # (int8 tiles, TileIndex.quantize_int8): hop
                             # dots are descaled to absolute units so the
                             # cross-cluster top-k merge stays valid
    *,
    k: int,
    T: int,                  # clusters scanned per query (the sweep knob)
    Lc: int,                 # cluster-queue width (>= T)
    metric: Metric,
    use_graph: bool = True,
    scan_impl: str = "xla",  # "grouped" | "xla" | "pallas" |
                             # "pallas_interpret"
    valid_clusters: jnp.ndarray | None = None,  # scalar int32: clusters
                             # >= this are stacking padding (sharded layout)
                             # and must never enter the frontier queue
    radii: jnp.ndarray | None = None,  # [K] f32 cluster radii (early exit)
    early_exit: bool = False,  # adaptive termination: a query stops when no
                             # queued unexpanded cluster's score BOUND
                             # (s_centroid - slack*|q|*R; L2 analog squares)
                             # can beat its current k-th result — the tile
                             # analog of the reference's per-query
                             # queue-exhaustion termination
                             # (src/index_bipartite.cpp:2356). Easy queries
                             # stop in a few hops; T becomes a cap.
    nbr_impl: str = "auto",  # neighbor centroid-score lookup: "onehot"
                             # (dense one-hot einsum over [B, Mc, K] — small
                             # K), "dense" (recompute scores from the
                             # pre-gathered adj_cents table: contiguous row
                             # reads + a tiny contraction — large K), or
                             # "gather" (per-element s gather — fallback).
                             # "auto" picks onehot while [B, Mc, K] <= 1 GB,
                             # else dense when the table is present.
    merge_every: int = 1,    # defer the running top-k merge across this
                             # many hops (ONE top_k over merge_every*C
                             # candidates instead of merge_every passes):
                             # bit-identical results — the walk depends
                             # only on centroid scores and clusters
                             # partition the base — at 1/merge_every of the
                             # merge cost. Requires early_exit=False (the
                             # stop rule reads the running k-th result).
    exit_slack: float | None = None,  # bound tightness: 1.0 = the provable
                             # worst-case Cauchy-Schwarz bound (rarely stops
                             # — the residual is near-orthogonal to q in
                             # high dim); None = auto min(1, 5/sqrt(D)):
                             # residual projections concentrate around
                             # |q|*R/sqrt(D), so ~5 sigma of margin remains
    dedup_impl: str = "compare",  # cluster-dedup on enqueue: "compare"
                             # checks neighbors against the expanded list
                             # ([B, Mc, T]) and the queue ([B, Lc, Mc]) —
                             # exact re-enqueue semantics, but the compare
                             # volume grows with T and Lc (at 10M shapes,
                             # T=768/Lc=768, it is ~400M ops/hop and
                             # dominates). "flags" keeps a [B, K] int8
                             # ever-enqueued bitmap: O(Mc) gather+scatter
                             # per hop, constant in T/Lc; differs only in
                             # that a cluster pushed off the queue bottom
                             # can never re-enter (it ranked below Lc live
                             # candidates — measured recall-neutral).
    expand_batch: int = 1,   # expand this many clusters per loop iteration
                             # sharing ONE queue sort + ONE result merge:
                             # per-expansion queue cost drops ~E-fold
                             # ((Lc + E*Mc)/E vs Lc + Mc). The E picks read
                             # an iteration-stale frontier (batched
                             # best-first) — not bit-identical to serial
                             # expansion, recall-neutral at E << T.
                             # Requires dedup_impl="flags" (the queue-
                             # membership compare can't see siblings'
                             # in-flight candidates) and not early_exit.
):
    """Lockstep tile search: a fixed ``T``-step fori_loop (static shapes, no
    data-dependent control flow), one MXU contraction per expanded cluster.

    ``scan_impl="pallas"`` runs the per-hop cluster scan as the fused
    double-buffered DMA kernel (:func:`_scan_clusters_pallas`) — every tile
    byte crosses HBM once instead of thrice.

    Returns (ids [B, k] int32 global, dists [B, k], cmps [B], hops [B]).
    """
    K, Dp, C = tiles_t.shape
    B = queries.shape[0]
    Lc = min(Lc, K)
    if metric is Metric.L2 and norms is None:
        raise ValueError("L2 tile search needs precomputed norms (upload())")
    if merge_every > 1 and early_exit:
        raise ValueError("merge_every > 1 is incompatible with early_exit "
                         "(the stop rule reads the running k-th result)")
    if dedup_impl not in ("compare", "flags"):
        raise ValueError(f"unknown dedup_impl {dedup_impl!r}")
    if expand_batch > 1:
        if early_exit:
            raise ValueError("expand_batch > 1 is incompatible with "
                             "early_exit (per-hop stop rule)")
        if dedup_impl != "flags":
            raise ValueError("expand_batch > 1 requires dedup_impl='flags' "
                             "(queue-membership compares can't see sibling "
                             "expansions' in-flight candidates)")
    # neighbor centroid-score lookup: a [B, Mc] element gather costs ~15 ns
    # per element on TPU; the one-hot einsum form runs as dense vector math
    # (~2x faster) but materializes [B, Mc, K] — only worth it while that
    # buffer stays modest. Past that (1M+: K in the thousands), the dense
    # path re-scores neighbors from the pre-gathered [K, Mc, D] centroid
    # table: B contiguous Mc*D row reads + one batched contraction — no
    # per-element access at all.
    Mc_w = adj.shape[1]
    if nbr_impl == "auto":
        if B * Mc_w * K * 4 <= (1 << 30):
            nbr_impl = "onehot"
        else:
            nbr_impl = "dense" if adj_cents is not None else "gather"
    if nbr_impl == "dense" and adj_cents is None:
        raise ValueError("nbr_impl='dense' needs the adj_cents table "
                         "(upload())")

    # fused scan+select kernels: the hop's candidates are reduced C -> p_sel
    # inside the kernel (exact for the final top-k: clusters partition the
    # base and each cluster is expanded at most once per query). Selection
    # order is invariant to the positive per-cluster int8 descale, so the
    # kernel selects in raw units and scores are descaled after.
    fused = scan_impl in ("pallas_fused", "pallas_fused_interpret",
                          "grouped_pallas_fused",
                          "grouped_pallas_fused_interpret")
    if fused:
        if metric is Metric.L2 and scales is not None:
            raise ValueError("fused scan impls do not support int8 + L2 "
                             "(the descale is not rank-neutral under the "
                             "norms offset); use an unfused impl")
        p_sel = max(k, 16)
        if p_sel > C:
            raise ValueError(f"fused scan needs k <= cluster size, got "
                             f"k={k} C={C}")
        cl_valid = jnp.sum(gids != PAD, axis=1).astype(jnp.int32)  # [K]

    # frontier ordering: all-centroid scores, one [B, K] contraction
    s = pairwise_scores(queries, centroids, metric,
                        precision=jax.lax.Precision.DEFAULT)     # [B, K]
    if valid_clusters is not None:
        s = jnp.where(jnp.arange(K)[None, :] < valid_clusters, s, jnp.inf)
    q_d, q_i = jax.lax.top_k(-s, Lc)
    q_d, q_i = -q_d, q_i.astype(jnp.int32)
    if valid_clusters is not None:
        # an underfull shard (Lc > live clusters) must idle, not expand
        # stacking-padding clusters
        q_i = jnp.where(jnp.isfinite(q_d), q_i, BIG)
    q_e = jnp.zeros((B, Lc), jnp.int32)

    rk_d = jnp.full((B, k), jnp.inf, jnp.float32)
    rk_i = jnp.full((B, k), BIG, jnp.int32)
    # visited = the expanded-cluster list (one slot per hop): membership
    # tests are a [B, Mc, T] vector compare instead of bitmask
    # gather/scatter (2.4x faster at serving shapes, probe_hop_variants —
    # but the compare volume grows with T; dedup_impl="flags" replaces it
    # at large T*K serving shapes)
    xlist = jnp.full((B, T), BIG, jnp.int32)
    cmps = jnp.zeros((B,), jnp.int32)
    hops = jnp.zeros((B,), jnp.int32)
    b_arange = jnp.arange(B)
    if dedup_impl == "flags":
        # ever-enqueued bitmap; initial queue entries are marked (invalid
        # slots carry id BIG -> out-of-bounds -> dropped)
        enq = jnp.zeros((B, K), jnp.int8)
        enq = enq.at[b_arange[:, None], q_i].set(1, mode="drop")
    else:
        enq = jnp.zeros((1, 1), jnp.int8)  # dummy carry
    qf = queries.astype(jnp.float32)
    qp = jnp.pad(qf, ((0, 0), (0, Dp - qf.shape[1])))  # zero-padded to D_pad

    if early_exit and radii is None:
        raise ValueError("early_exit tile search needs cluster radii "
                         "(TileIndex.with_radii())")
    if exit_slack is None:
        exit_slack = min(1.0, 5.0 / float(np.sqrt(queries.shape[1])))

    def eligible(q_d, q_i, q_e, rk_d):
        unexp = (q_e == 0) & (q_i != BIG)
        if not early_exit:
            return unexp
        Rg = exit_slack * radii[jnp.clip(q_i, 0, K - 1)]     # [B, Lc]
        if metric is Metric.L2:
            bnd = jnp.square(jnp.maximum(
                jnp.sqrt(jnp.maximum(q_d, 0.0)) - Rg, 0.0))
        else:
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=1))[:, None]
            bnd = q_d - qn * Rg
        # improvable set only shrinks (rk_d is monotone), so no livelock
        return unexp & (bnd < rk_d[:, k - 1][:, None])

    def expand(t, wstate, rk_d, defer_queue=False):
        """One cluster expansion WITHOUT the running top-k merge: frontier
        select, xlist slot, cluster scan/score, queue update, counters.
        Returns the walk state plus this hop's (scores, ids) candidates —
        the walk depends only on centroid scores (and, under early_exit,
        on rk_d), so the rk merge can be deferred across hops. With
        ``defer_queue`` the new frontier candidates are returned instead of
        sorted into the queue (expand_batch shares one sort per group)."""
        q_d, q_i, q_e, xlist, cmps, hops, enq = wstate
        unexp = eligible(q_d, q_i, q_e, rk_d)
        active = jnp.any(unexp, axis=1)
        jj = jnp.argmax(unexp, axis=1)
        f = jnp.where(active, q_i[b_arange, jj], 0)
        q_e = q_e.at[b_arange, jj].set(jnp.where(active, 1, q_e[b_arange, jj]))

        # record the expanded cluster in this hop's slot (BIG when inactive
        # so cluster 0 is never falsely marked)
        xlist = jax.lax.dynamic_update_slice_in_dim(
            xlist, jnp.where(active, f, BIG)[:, None], t, axis=1)

        # ---- scan the cluster: one sequential block read + one matmul ----
        if fused:
            nrm = norms if metric is Metric.L2 else None
            if scan_impl.startswith("grouped"):
                v, pids = _scan_clusters_grouped_pallas_fused(
                    tiles_t, gids, f, qp, p=p_sel, norms=nrm,
                    interpret=scan_impl.endswith("interpret"))
            else:
                v, pids = _scan_clusters_pallas_fused(
                    tiles_t, gids, f, qp, p=p_sel, norms=nrm,
                    interpret=scan_impl.endswith("interpret"))
            if metric is Metric.L2:
                # kernel emitted |x|^2 - 2<q,x>; |q|^2 is rank-neutral
                sc = v + jnp.sum(qf * qf, axis=1, keepdims=True)
            elif scales is not None:
                sc = v * scales[f][:, None]
            else:
                sc = v
            live = (pids != BIG) & active[:, None]
            sc = jnp.where(live, sc, jnp.inf)
            ids = jnp.where(live, pids, BIG)                 # [B, p_sel]
            n_scored = jnp.where(active, cl_valid[f], 0)
        else:
            ids = gids[f]                                 # [B, C]
            if scan_impl == "grouped":
                dots = _scan_clusters_grouped(tiles_t, f, qp)
            elif scan_impl in ("grouped_pallas", "grouped_pallas_interpret"):
                dots = _scan_clusters_grouped_pallas(
                    tiles_t, f, qp,
                    interpret=(scan_impl == "grouped_pallas_interpret"))
            elif scan_impl == "xla":
                tile = tiles_t[f]                         # [B, Dp, C] blocks
                if tile.dtype == jnp.int8:
                    # int8 values are exact in bf16 (8 mantissa bits cover
                    # ±127); the convert fuses into the dot's operand read
                    tile = tile.astype(jnp.bfloat16)
                dots = jax.lax.dot_general(
                    tile, qp, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # [B, C]
            else:
                dots = _scan_clusters_pallas(
                    tiles_t, f, qp,
                    interpret=(scan_impl == "pallas_interpret"))
            if scales is not None:
                dots = dots * scales[f][:, None]
            if metric is Metric.L2:
                qn = jnp.sum(qf * qf, axis=1, keepdims=True)
                sc = qn + norms[f] - 2.0 * dots
            else:
                sc = -dots
            live = (ids != PAD) & active[:, None]
            sc = jnp.where(live, sc, jnp.inf)
            ids = jnp.where(live, ids, BIG)
            n_scored = jnp.where(active, jnp.sum(live, axis=1), 0)

        nbr_extra = None
        if use_graph:
            # merge unvisited graph neighbors into the cluster queue, ranked
            # by their precomputed centroid score
            nbr = adj[f]                                  # [B, Mc]
            n_ok = (nbr != PAD) & active[:, None]
            n_safe = jnp.clip(nbr, 0, K - 1)
            if dedup_impl == "flags":
                # O(Mc) bitmap gather+scatter, constant in T/Lc. The
                # scatter is sequenced before any sibling expansion's
                # gather by the enq data dependency, so expand_batch
                # groups dedup exactly across their E expansions.
                n_ok = n_ok & (enq[b_arange[:, None], n_safe] == 0)
                mark = jnp.where(n_ok, n_safe, K)  # K = OOB -> dropped
                enq = enq.at[b_arange[:, None], mark].set(1, mode="drop")
            else:
                seen = jnp.any(n_safe[:, :, None] == xlist[:, None, :],
                               axis=2)
                queued = jnp.any(q_i[:, :, None] == n_safe[:, None, :],
                                 axis=1)
                n_ok = n_ok & ~seen & ~queued
            if nbr_impl == "onehot":
                oh = (n_safe[:, :, None] ==
                      jnp.arange(K)[None, None, :]).astype(s.dtype)
                n_s = jnp.einsum("bmk,bk->bm", oh, s)
            elif nbr_impl == "dense":
                # recompute scores from the pre-gathered neighbor-centroid
                # table: adj_cents[f] is B contiguous [Mc, D] blocks — a
                # sequential read, not an element gather. Scores match the
                # s matrix up to contraction-order/storage-dtype rounding;
                # they only rank the frontier, so near-tie flips are
                # recall-neutral.
                ac = adj_cents[f]                       # [B, Mc, D]
                n_dots = jax.lax.dot_general(
                    ac, queries.astype(ac.dtype),
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [B, Mc]
                if metric is Metric.L2:
                    qn2 = jnp.sum(qf * qf, axis=1, keepdims=True)
                    n_s = qn2 + adj_cnorms[f] - 2.0 * n_dots
                else:
                    n_s = -n_dots
            else:
                n_s = s[b_arange[:, None], n_safe]
            n_d = jnp.where(n_ok, n_s, jnp.inf)
            n_i = jnp.where(n_ok, nbr, BIG)
            if defer_queue:
                nbr_extra = (n_d, n_i)
            else:
                all_qd = jnp.concatenate([q_d, n_d], axis=1)
                all_qi = jnp.concatenate([q_i, n_i], axis=1)
                all_qe = jnp.concatenate([q_e, jnp.zeros_like(n_i)], axis=1)
                all_qd, all_qi, all_qe = jax.lax.sort(
                    (all_qd, all_qi, all_qe), num_keys=2)
                q_d, q_i, q_e = (all_qd[:, :Lc], all_qi[:, :Lc],
                                 all_qe[:, :Lc])

        cmps = cmps + n_scored
        hops = hops + active.astype(jnp.int32)
        return (q_d, q_i, q_e, xlist, cmps, hops, enq), sc, ids, nbr_extra

    def merge_rk(rk_d, rk_i, sc, ids):
        all_d = jnp.concatenate([rk_d, sc], axis=1)
        all_i = jnp.concatenate([rk_i, ids], axis=1)
        neg, pos = jax.lax.top_k(-all_d, k)
        return -neg, jnp.take_along_axis(all_i, pos, axis=1)

    def hop(t, state):
        q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq = state
        w, sc, ids, _ = expand(t, (q_d, q_i, q_e, xlist, cmps, hops, enq),
                               rk_d)
        rk_d, rk_i = merge_rk(rk_d, rk_i, sc, ids)
        q_d, q_i, q_e, xlist, cmps, hops, enq = w
        return q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq

    def hop_group(sz, base=None):
        """sz expansions then ONE rk merge over their sz*C candidates —
        clusters partition the base (gids disjoint across hops) and the
        walk ignores rk without early_exit, so the result is bit-identical
        to per-hop merging while paying 1/sz of the merge passes.
        ``base``: absolute hop index of the group's first expansion
        (defaults to g*sz for the fori_loop over full groups)."""
        def body(g, state):
            q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq = state
            t0 = g * sz if base is None else base
            w = (q_d, q_i, q_e, xlist, cmps, hops, enq)
            scs, idss = [], []
            for j in range(sz):  # static unroll
                w, sc, ids, _ = expand(t0 + j, w, rk_d)
                scs.append(sc)
                idss.append(ids)
            rk_d, rk_i = merge_rk(rk_d, rk_i,
                                  jnp.concatenate(scs, axis=1),
                                  jnp.concatenate(idss, axis=1))
            q_d, q_i, q_e, xlist, cmps, hops, enq = w
            return q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq
        return body

    def hop_ebatch(sz, base=None):
        """sz expansions off an iteration-stale frontier, then ONE queue
        sort over [Lc + sz*Mc] and ONE rk merge — per-expansion queue cost
        (Lc + sz*Mc)/sz. Flags-dedup sequences each expansion's bitmap
        scatter before its siblings' gathers, so cross-expansion duplicate
        enqueues are impossible and every cluster is still expanded at
        most once."""
        def body(g, state):
            q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq = state
            t0 = g * sz if base is None else base
            w = (q_d, q_i, q_e, xlist, cmps, hops, enq)
            scs, idss, nds, nis = [], [], [], []
            for j in range(sz):  # static unroll
                w, sc, ids, extra = expand(t0 + j, w, rk_d,
                                           defer_queue=True)
                scs.append(sc)
                idss.append(ids)
                if extra is not None:
                    nds.append(extra[0])
                    nis.append(extra[1])
            q_d, q_i, q_e, xlist, cmps, hops, enq = w
            if nds:
                all_qd = jnp.concatenate([q_d] + nds, axis=1)
                all_qi = jnp.concatenate([q_i] + nis, axis=1)
                all_qe = jnp.concatenate(
                    [q_e, jnp.zeros((B, all_qi.shape[1] - Lc), q_e.dtype)],
                    axis=1)
                all_qd, all_qi, all_qe = jax.lax.sort(
                    (all_qd, all_qi, all_qe), num_keys=2)
                q_d, q_i, q_e = (all_qd[:, :Lc], all_qi[:, :Lc],
                                 all_qe[:, :Lc])
            rk_d, rk_i = merge_rk(rk_d, rk_i,
                                  jnp.concatenate(scs, axis=1),
                                  jnp.concatenate(idss, axis=1))
            return q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq
        return body

    state = (q_d, q_i, q_e, xlist, rk_d, rk_i, cmps, hops, enq)
    if expand_batch > 1:
        Eb = min(expand_batch, T)
        n_g = T // Eb
        state = jax.lax.fori_loop(0, n_g, hop_ebatch(Eb), state)
        if T - n_g * Eb:
            state = hop_ebatch(T - n_g * Eb, base=n_g * Eb)(0, state)
    elif merge_every > 1 and not early_exit:
        Mh = min(merge_every, T)
        n_g = T // Mh
        state = jax.lax.fori_loop(0, n_g, hop_group(Mh), state)
        if T - n_g * Mh:
            state = hop_group(T - n_g * Mh, base=n_g * Mh)(0, state)
    elif early_exit:
        # batch-level exit too: the loop ends when EVERY query has stopped
        def w_cond(ts):
            t, st = ts
            return (t < T) & jnp.any(eligible(st[0], st[1], st[2], st[4]))

        def w_body(ts):
            t, st = ts
            return t + 1, hop(t, st)

        _, state = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0), state))
    else:
        state = jax.lax.fori_loop(0, T, hop, state)
    _, _, _, _, rk_d, rk_i, cmps, hops, _ = state
    out_i = jnp.where(rk_i == BIG, -1, rk_i)
    return out_i, rk_d, cmps, hops


@functools.partial(
    jax.jit,
    static_argnames=("k", "T", "Lc", "metric", "use_graph", "scan_impl",
                     "early_exit", "exit_slack", "nbr_impl", "merge_every",
                     "dedup_impl", "expand_batch"))
def _tile_search_packed(tiles_t, gids, centroids, adj, queries, norms,
                        radii=None, adj_cents=None, adj_cnorms=None,
                        scales=None, *,
                        k, T, Lc, metric, use_graph,
                        scan_impl, early_exit=False, exit_slack=None,
                        nbr_impl="auto", merge_every=1,
                        dedup_impl="compare", expand_batch=1):
    """tile_search_batch + on-device packing of the four results into ONE
    [B, 2k+2] int32 array (dists bitcast). The serving host fetches a single
    buffer per batch — through a high-RTT device relay, four separate D2H
    transfers cost more than the whole hop loop."""
    from .search import pack_results
    ids, dists, cmps, hops = tile_search_batch(
        tiles_t, gids, centroids, adj, queries, norms,
        adj_cents, adj_cnorms, scales, k=k, T=T, Lc=Lc,
        metric=metric, use_graph=use_graph, scan_impl=scan_impl,
        radii=radii, early_exit=early_exit, exit_slack=exit_slack,
        nbr_impl=nbr_impl, merge_every=merge_every,
        dedup_impl=dedup_impl, expand_batch=expand_batch)
    return pack_results(ids, dists, cmps, hops)


def tile_search(index: TileIndex, queries, *, k: int = 10, T: int = 8,
                Lc: int | None = None, metric: Metric | str = Metric.IP,
                use_graph: bool = True, batch_size: int = 2048,
                device_arrays: tuple | None = None,
                scan_impl: str = "auto", early_exit: bool = False,
                exit_slack: float | None = None, nbr_impl: str = "auto",
                merge_every: int = 1, dedup_impl: str = "compare",
                expand_batch: int = 1):
    """Host wrapper: loop device-sized query blocks; returns numpy
    (ids [Q, k], dists [Q, k], cmps [Q], hops [Q]).

    ``device_arrays`` — optional pre-uploaded :func:`upload` tuple to share
    one upload across sweep points. ``scan_impl``: "auto" selects the
    cluster-grouped batched contraction — the fastest measured per-hop scan
    (DESIGN.md cost table); "pallas" (the double-buffered DMA kernel,
    C % 128 == 0 required) and "xla" (plain gather+dot) stay selectable for
    A/B runs. ``dedup_impl="flags"`` + ``expand_batch=E`` is the large-T
    serving mode: bitmap dedup (constant in T/Lc) and E expansions per
    queue sort (see tile_search_batch)."""
    metric = Metric.parse(metric)
    if device_arrays is None:
        device_arrays = upload(index)
    # 5-tuple accepted for back-compat (pre-adj_cents callers)
    tiles, gids, cents, adj, norms = device_arrays[:5]
    adj_cents = device_arrays[5] if len(device_arrays) > 5 else None
    adj_cnorms = device_arrays[6] if len(device_arrays) > 6 else None
    scales = device_arrays[7] if len(device_arrays) > 7 else None
    if scales is None and index.scales is not None:
        scales = jnp.asarray(index.scales)
    if scan_impl == "auto":
        # grouped scan is the fastest measured per-hop path while its
        # [G, nq, C]/[G, nq, Dp] staging buffers stay modest (G is bounded
        # by min(K, B) + B/nq — _num_groups — so this holds at any K for
        # serving batch sizes). Past that, prefer the fused-DMA Pallas
        # kernel when its tiling constraints hold (every tile byte crosses
        # HBM once) — the XLA gather+dot's [B, Dp, C] staging buffer costs
        # ~3x the scan bytes per hop; keep it only as the portable fallback.
        K_, Dp_, C_ = tiles.shape
        G_ = _num_groups(K_, batch_size, 64)
        if G_ * 64 * max(Dp_, C_) * 4 <= (1 << 30):
            scan_impl = "grouped"
        elif (C_ % 128 == 0 and batch_size % _GQ == 0
              and jax.default_backend() == "tpu"):
            scan_impl = "pallas"
        else:
            scan_impl = "xla"
    radii_dev = None
    if early_exit:
        index = index.with_radii()
        radii_dev = jnp.asarray(index.radii)
    # keep queries device-resident (a jnp input is NOT pulled back to host —
    # re-uploading the query set per sweep point costs more than a hop)
    queries = jnp.asarray(queries)
    Q = queries.shape[0]
    Lc = Lc or 2 * T
    Bsz = min(batch_size, Q) if Q else batch_size
    ids = np.empty((Q, k), np.int32)
    dists = np.empty((Q, k), np.float32)
    cmps = np.empty((Q,), np.int32)
    hops = np.empty((Q,), np.int32)
    pending = []
    for s in range(0, Q, Bsz):
        e = min(s + Bsz, Q)
        qb = queries[s:e]
        if e - s < Bsz:
            qb = jnp.pad(qb, ((0, Bsz - (e - s)), (0, 0)))
        res = _tile_search_packed(tiles, gids, cents, adj, qb,
                                  norms, radii_dev, adj_cents, adj_cnorms,
                                  scales, k=k, T=T, Lc=Lc,
                                  metric=metric, use_graph=use_graph,
                                  scan_impl=scan_impl, early_exit=early_exit,
                                  exit_slack=exit_slack, nbr_impl=nbr_impl,
                                  merge_every=merge_every,
                                  dedup_impl=dedup_impl,
                                  expand_batch=expand_batch)
        pending.append((s, e, res))
    from .search import unpack_results
    for s, e, res in pending:
        bi, bd, bc, bh = unpack_results(np.asarray(res)[: e - s], k)
        ids[s:e], dists[s:e], cmps[s:e], hops[s:e] = bi, bd, bc, bh
    return ids, dists, cmps, hops


@functools.partial(jax.jit, static_argnames=("Dp",))
def _to_scan_layout(tiles, *, Dp, scales=None):
    tt = jnp.pad(tiles, ((0, 0), (0, 0), (0, Dp - tiles.shape[2])))
    norms = jnp.sum(tiles.astype(jnp.float32) ** 2, axis=2)
    if scales is not None:  # int8 storage: |v|^2 in absolute (dequant) units
        norms = norms * jnp.square(scales)[:, None]
    return jnp.swapaxes(tt, 1, 2), norms


def upload(index: TileIndex, *, nbr_table: bool | None = None) -> tuple:
    """One-time device upload of the searchable arrays: the transposed
    ``[K, D_pad, C]`` scan layout (tile-aligned minor dims for the DMA
    kernel, and equally valid for the XLA contraction), per-vector squared
    norms (the L2 score term), and — for large-K indexes — the pre-gathered
    ``adj_cents [K, Mc, D]`` neighbor-centroid table (+ its norms) powering
    the dense neighbor-score path of :func:`tile_search_batch`.

    ``nbr_table``: force the table on/off; default builds it when K is big
    enough that the one-hot lookup would fall off its 1 GB buffer budget at
    serving batch sizes (the table costs K*Mc*D of tile-dtype HBM — ~0.7 GB
    at 10M-scale bf16, repaid every hop)."""
    D = index.tiles.shape[2]
    K, Mc = index.adj.shape
    scales_dev = (None if index.scales is None
                  else jnp.asarray(index.scales))
    tiles_t, norms = _to_scan_layout(jnp.asarray(index.tiles),
                                     Dp=_pad_d(D), scales=scales_dev)
    if nbr_table is None:
        nbr_table = 8192 * Mc * K * 4 > (1 << 30)
    adj_cents = adj_cnorms = None
    if nbr_table:
        safe = np.clip(index.adj, 0, K - 1)
        ac = index.centroids[safe]                       # [K, Mc, D] f32
        ac = np.where((index.adj == PAD)[:, :, None], 0.0, ac)
        adj_cnorms = jnp.asarray((ac.astype(np.float32) ** 2).sum(axis=2))
        # centroid table stays float even for int8 tiles (it is Mc/C-th the
        # size and only ranks the frontier)
        if index.scales is not None:
            adj_cents = jnp.asarray(ac, dtype=jnp.bfloat16)
        else:
            adj_cents = jnp.asarray(ac.astype(index.tiles.dtype))
    return (tiles_t, jnp.asarray(index.gids),
            jnp.asarray(index.centroids), jnp.asarray(index.adj), norms,
            adj_cents, adj_cnorms, scales_dev)
