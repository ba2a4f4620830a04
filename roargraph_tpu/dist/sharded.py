"""Multi-chip scale-out over a ``jax.sharding.Mesh`` (SURVEY.md §5.8).

The reference is single-node shared-memory only (§2.3: OpenMP + mutexes; no
collectives of any kind). The TPU-native scale-out design:

- **Base/graph sharding ("shard" axis)**: the base set is partitioned into
  contiguous shards; each device owns one shard's vectors and a RoarGraph
  built over that shard. A query searches every shard's sub-graph locally
  (pure ICI-free compute) and the per-shard top-k are merged into a global
  top-k with one ``all_gather`` over the shard axis — the TPU analog of the
  reference's "scale N only by RAM on one box".
- **Query data-parallel ("dp" axis)**: the query batch is split across the dp
  axis — the analog of the reference's OpenMP query loop
  (``tests/test_search_roargraph.cpp:203``).
- **Sharded groundtruth**: exact k-NN with the base sharded; each device
  scans its shard, then one gather+top_k merge. Replaces the "can take hours"
  single-host MKL step (``README.md:69-75``) with near-linear scaling.

Everything below is pure SPMD: ``shard_map`` + XLA collectives, no host
round-trips inside a step.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import BuildConfig, Metric, SearchConfig
from ..graph import PAD
from ..search import BIG, beam_search_batch


def make_mesh(n_shard: int, n_dp: int = 1,
              devices: Sequence | None = None) -> Mesh:
    devs = np.array(devices if devices is not None
                    else jax.devices()[: n_shard * n_dp])
    if devs.size < n_shard * n_dp:
        raise ValueError(
            f"need {n_shard * n_dp} devices, have {devs.size}")
    return Mesh(devs[: n_shard * n_dp].reshape(n_dp, n_shard),
                ("dp", "shard"))


# ---------------------------------------------------------------------------
# Sharded index container
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ShardedRoarGraph:
    """S per-shard sub-graphs over a contiguous partition of the base set.

    Stacked layout (leading shard axis, equal padded shard sizes):
      adj   [S, N_s, W] int32 local-id adjacency
      base  [S, N_s, D] vectors (zero rows beyond shard_sizes)
      eps   [S] int32 local entry points
      offsets [S] int32 global id of each shard's first row
    """
    adj: np.ndarray
    base: np.ndarray
    eps: np.ndarray
    offsets: np.ndarray
    shard_sizes: np.ndarray
    # optional per-shard coarse quantizer for seeded starts:
    # seed_ids [S, C] local ids (PAD-filled), seed_vecs [S, C, D]
    seed_ids: np.ndarray | None = None
    seed_vecs: np.ndarray | None = None

    @property
    def num_shards(self) -> int:
        return self.adj.shape[0]

    def save_npz(self, path: str) -> None:
        extra = {}
        if self.seed_ids is not None:
            extra = dict(seed_ids=self.seed_ids, seed_vecs=self.seed_vecs)
        np.savez_compressed(path, adj=self.adj, base=self.base, eps=self.eps,
                            offsets=self.offsets,
                            shard_sizes=self.shard_sizes, **extra)

    @staticmethod
    def load_npz(path: str) -> "ShardedRoarGraph":
        with np.load(path) as z:
            return ShardedRoarGraph(
                z["adj"], z["base"], z["eps"], z["offsets"],
                z["shard_sizes"],
                seed_ids=z["seed_ids"] if "seed_ids" in z else None,
                seed_vecs=z["seed_vecs"] if "seed_vecs" in z else None)


def sharded_phase_a_step(mesh: Mesh, *, metric: Metric, M: int, M_sq: int,
                         chunk: int, knn_k: int, knn_tile: int):
    """One SPMD mesh program computing, for every shard in parallel: the
    training queries' *local* exact NN lists against the shard, then the
    phase-A occlusion prune of every query's NN tail (``build._phase_a_core``)
    — the heavy per-shard build math runs on all devices at once instead of
    the sequential host loop.

    Returned fn: (train_q [Nq, D] replicated, bases [S, n_s, D] sharded)
    -> (knn_ids [S, Nq, knn_k], tgt [S, Nqp], ids [S, Nqp, M],
        dists [S, Nqp, M]) with Nqp = Nq padded to a multiple of ``chunk``.
    """
    from ..build import _phase_a_core
    from ..ops.topk import knn_tiled

    def local(train_q, bases):
        shard = bases[0]
        # local exact NN ids (shard-local id space); inf padding rows can
        # never win inside knn_tiled's top-k
        ids, _ = knn_tiled(train_q, shard, k=knn_k, metric=metric,
                           tile=knn_tile)
        Nq = ids.shape[0]
        pad = (-Nq) % chunk
        knn_p = ids.astype(jnp.int32)
        if pad:
            knn_p = jnp.concatenate(
                [knn_p, jnp.full((pad, knn_k), -1, jnp.int32)])
        tgt, pi, pd = _phase_a_core(knn_p, shard, metric=metric, M=M,
                                    M_sq=M_sq, chunk=chunk)
        return ids[None], tgt[None], pi[None], pd[None]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("shard")),
        out_specs=(P("shard"), P("shard"), P("shard"), P("shard")),
        check_vma=False)
    return jax.jit(fn)


def sharded_phase_b_program(mesh: Mesh, *, metric: Metric, M: int, L: int,
                            B: int, steps: int, expand_width: int = 1):
    """One SPMD mesh program advancing EVERY shard's phase B by ``steps``
    incremental batches of ``B`` nodes (``build._phase_b_search_prune``'s
    loop body, run per-shard in lockstep under ``shard_map``).

    Phase B dominates build wall-clock (98% at 1M — BASELINE.md) and each
    shard's supply graph is independent, so this is the scale-out lever the
    reference reaches with 64 OpenMP threads
    (``src/index_bipartite.cpp:1192-1269``): S chips run S shards' phase B
    concurrently; zero collectives — the only cross-device coupling is the
    lockstep trip count (shards are padded to equal size).

    Returned fn: (supply_i [S,N_s,W], supply_d, deg [S,N_s], proj_i
    [S,N_s,M], base [S,N_s,D], eps [S], sizes [S], node_start) -> updated
    (supply_i, supply_d, deg); ``node_start`` is the first node id (traced,
    so one compile serves the whole host-side schedule/checkpoint loop —
    the host walks ``build.phase_b_schedule`` and calls one program
    instance per distinct batch width).
    """
    from ..build import _phase_b_step
    step_fn = getattr(_phase_b_step, "__wrapped__", _phase_b_step)
    W = 2 * M
    max_hops = 16 * L + 64

    def local(supply_i, supply_d, deg, proj_i, base, eps, sizes, node_start):
        si, sd, dg = supply_i[0], supply_d[0], deg[0]
        pi_dev, bs, ep, size = proj_i[0], base[0], eps[0], sizes[0]
        N_s = si.shape[0]

        def body(t, carry):
            si, sd, dg = carry
            nodes = node_start + t * B + jnp.arange(B, dtype=jnp.int32)
            nodes_ok = nodes < size
            safe = jnp.clip(nodes, 0, N_s - 1)
            res = beam_search_batch(
                si, bs, bs[safe], ep, k=1, L=L, metric=metric,
                max_hops=max_hops, capture=L, exclude_self=True,
                self_ids=nodes, expand_width=expand_width,
                visited_mode="dedup", gather_chunk=0)
            return step_fn(si, sd, dg, res.ret_ids, res.ret_dists,
                           nodes, nodes_ok, pi_dev, bs,
                           metric=metric, M=M, W=W, prune_chunk=0)

        si, sd, dg = jax.lax.fori_loop(0, steps, body, (si, sd, dg))
        return si[None], sd[None], dg[None]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("shard"),) * 7 + (P(),),
        out_specs=(P("shard"),) * 3,
        check_vma=False)
    return jax.jit(fn)


def build_sharded(base, train_knn_fn, cfg: BuildConfig,
                  n_shards: int = 1, *, verbose: bool = False,
                  seed_centroids: int = 0, train_queries=None,
                  mesh: Mesh | None = None, spmd_phase_b: bool = False,
                  phase_b_steps_per_call: int = 0,
                  knn_tile: int = 2048) -> ShardedRoarGraph:
    """Partition the base set and build one RoarGraph per shard.

    Two modes:

    - sequential (``train_knn_fn``): per shard, the callback computes the
      training-query NN lists and the full build runs shard-by-shard;
    - SPMD (``train_queries`` + ``mesh``): the per-shard exact local k-NN and
      the phase-A occlusion prune — the bulk of the device math — run for
      *all shards at once* under ``shard_map`` (one device per shard); each
      shard's host completion (reverse rounds + phase B, itself
      device-resident) follows. Identical results to the sequential mode.

    ``seed_centroids > 0`` additionally builds a per-shard coarse quantizer
    for seeded starts."""
    from ..build import build_roargraph
    from ..graph import PAD as _PAD

    if cfg is None:
        raise ValueError("build_sharded requires a BuildConfig")
    base = np.asarray(base)
    N, D = base.shape
    n_s = (N + n_shards - 1) // n_shards
    adjs, bases, eps, offs, sizes, seeds = [], [], [], [], [], []
    width = 0

    phase_a_per_shard = {}
    if mesh is not None and train_queries is not None:
        train_q = np.asarray(train_queries)
        Nq = train_q.shape[0]
        chunk = min(cfg.prune_batch, Nq)
        # inf-padded stack: padding rows can never enter a local top-k
        stacked = np.full((n_shards, n_s, D), np.inf, base.dtype)
        for s in range(n_shards):
            lo, hi = s * n_s, min((s + 1) * n_s, N)
            stacked[s, : hi - lo] = base[lo:hi]
        step = sharded_phase_a_step(
            mesh, metric=cfg.metric, M=cfg.M_pjbp, M_sq=cfg.M_sq,
            chunk=chunk, knn_k=cfg.M_sq, knn_tile=knn_tile)
        _, tgt, pi, pd = step(jnp.asarray(train_q), jnp.asarray(stacked))
        # (the per-shard local kNN lists stay on device — only the pruned
        # phase-A rows are needed on the host)
        tgt, pi, pd = np.asarray(tgt), np.asarray(pi), np.asarray(pd)
        for s in range(n_shards):
            size = min(n_s, N - s * n_s)
            # host scatter (last query wins), exactly build._phase_a
            adj_i = np.full((size, cfg.M_pjbp), _PAD, np.int32)
            adj_d = np.full((size, cfg.M_pjbp), np.inf, np.float32)
            t = tgt[s, :Nq].astype(np.int64)
            adj_i[t] = pi[s, :Nq]
            adj_d[t] = pd[s, :Nq]
            phase_a_per_shard[s] = (adj_i, adj_d)

    spmd_graphs = None
    if spmd_phase_b:
        if mesh is None or not phase_a_per_shard:
            raise ValueError("spmd_phase_b requires mesh + train_queries")
        spmd_graphs = _spmd_phase_b_finish(
            base, phase_a_per_shard, cfg, mesh, n_shards, n_s,
            steps_per_call=phase_b_steps_per_call, verbose=verbose)

    for s in range(n_shards):
        lo, hi = s * n_s, min((s + 1) * n_s, N)
        shard = base[lo:hi]
        if spmd_graphs is not None:
            g = spmd_graphs[s]
        elif s in phase_a_per_shard:
            g, _ = build_roargraph(shard, None, cfg, verbose=verbose,
                                   phase_a=phase_a_per_shard[s])
        else:
            if train_knn_fn is None:
                raise ValueError("need train_knn_fn, or train_queries+mesh")
            knn_ids = train_knn_fn(shard)
            g, _ = build_roargraph(shard, knn_ids, cfg, verbose=verbose)
        adjs.append(g.ids)
        width = max(width, g.ids.shape[1])
        if seed_centroids:
            from ..ops.seeds import build_seeds
            seeds.append(build_seeds(shard, n_centroids=seed_centroids,
                                     metric=cfg.metric))
        if shard.shape[0] < n_s:
            shard = np.concatenate(
                [shard, np.zeros((n_s - shard.shape[0], D), shard.dtype)])
        bases.append(shard)
        eps.append(g.ep)
        offs.append(lo)
        sizes.append(hi - lo)
    adj = np.full((n_shards, n_s, width), PAD, np.int32)
    for s, a in enumerate(adjs):
        adj[s, : a.shape[0], : a.shape[1]] = a
    seed_ids = seed_vecs = None
    if seed_centroids:
        C = max(si.seed_ids.size for si in seeds)
        seed_ids = np.full((n_shards, C), PAD, np.int32)
        seed_vecs = np.zeros((n_shards, C, D), base.dtype)
        for s, si in enumerate(seeds):
            c = si.seed_ids.size
            seed_ids[s, :c] = si.seed_ids
            seed_vecs[s, :c] = si.seed_vecs
    return ShardedRoarGraph(adj=adj, base=np.stack(bases),
                            eps=np.array(eps, np.int32),
                            offsets=np.array(offs, np.int32),
                            shard_sizes=np.array(sizes, np.int32),
                            seed_ids=seed_ids, seed_vecs=seed_vecs)


def _spmd_phase_b_finish(base, phase_a_per_shard, cfg: BuildConfig,
                         mesh: Mesh, n_shards: int, n_s: int, *,
                         steps_per_call: int = 0, verbose: bool = False):
    """Complete every shard's build with phase B running for ALL shards at
    once (:func:`sharded_phase_b_program`). Bit-identical to the sequential
    ``build_roargraph`` per-shard path: reverse rounds, incremental phase B,
    final degree check, and supply merge all follow ``build.py`` exactly —
    only the phase-B batch loop moves from a host loop over shards into one
    SPMD mesh program."""
    from ..build import (_merge_supply, _prune_rows_device, _reverse_round,
                         compute_medoid)
    from ..graph import PaddedGraph

    N, D = base.shape
    M, L, B = cfg.M_pjbp, cfg.L_pjpq, cfg.search_batch
    W = 2 * M

    sup_i = np.full((n_shards, n_s, W), PAD, np.int32)
    sup_d = np.full((n_shards, n_s, W), np.inf, np.float32)
    proj = np.full((n_shards, n_s, M), PAD, np.int32)
    stacked = np.zeros((n_shards, n_s, D), base.dtype)
    eps = np.zeros(n_shards, np.int32)
    sizes = np.zeros(n_shards, np.int32)
    for s in range(n_shards):
        lo, hi = s * n_s, min((s + 1) * n_s, N)
        shard = base[lo:hi]
        shard_dev = jnp.asarray(shard)
        adj_i, adj_d = phase_a_per_shard[s]
        for _ in range(2):
            adj_i, adj_d = _reverse_round(
                adj_i, adj_d, shard_dev, metric=cfg.metric, cap=M,
                prune_M=M, prune_backfill=True, out_width=M,
                batch=cfg.prune_batch)
        phase_a_per_shard[s] = (adj_i, adj_d)
        sup_i[s, : hi - lo, :M] = adj_i
        sup_d[s, : hi - lo, :M] = adj_d
        proj[s, : hi - lo] = adj_i
        stacked[s, : hi - lo] = shard
        eps[s] = compute_medoid(shard_dev)
        sizes[s] = hi - lo

    # Walk the shared batch schedule (ramp + uniform tail — identical
    # boundaries to the sequential per-shard build); one compiled program
    # per distinct (width, steps) pair.
    from ..build import phase_b_schedule
    sched = phase_b_schedule(n_s, B)
    runs = []  # (node_start, width, n_batches_in_run)
    for s, e, b in sched:
        if runs and runs[-1][1] == b and (
                not steps_per_call or runs[-1][2] < steps_per_call):
            runs[-1][2] += 1
        else:
            runs.append([s, b, 1])
    programs = {}
    deg = (sup_i != PAD).sum(axis=2).astype(np.int32)
    si, sd, dg = (jnp.asarray(sup_i), jnp.asarray(sup_d), jnp.asarray(deg))
    pj, bs = jnp.asarray(proj), jnp.asarray(stacked)
    ej, sz = jnp.asarray(eps), jnp.asarray(sizes)
    for node_start, b, k in runs:
        if (b, k) not in programs:
            programs[(b, k)] = sharded_phase_b_program(
                mesh, metric=cfg.metric, M=M, L=L, B=b, steps=k,
                expand_width=cfg.search_expand)
        si, sd, dg = programs[(b, k)](si, sd, dg, pj, bs, ej, sz,
                                      jnp.int32(node_start))
        if verbose and len(runs) > 1:
            print(f"spmd phase B: nodes {node_start + b * k}/{n_s}")
    sup_i, sup_d = np.array(si), np.array(sd)

    graphs = []
    for s in range(n_shards):
        size = int(sizes[s])
        shard_dev = jnp.asarray(stacked[s, :size])
        supply_i, supply_d = sup_i[s, :size], sup_d[s, :size]
        adj_i, _ = phase_a_per_shard[s]
        # final degree check + merge (``build.build_roargraph``)
        over = np.flatnonzero((supply_i != PAD).sum(axis=1) > M)
        if over.size:
            pi, pd = _prune_rows_device(
                supply_i[over], supply_d[over], supply_i[over] != PAD,
                over.astype(np.int32), shard_dev,
                metric=cfg.metric, M=M, backfill=False,
                batch=cfg.prune_batch)
            supply_i[over] = PAD
            supply_d[over] = np.inf
            supply_i[over, :M] = pi
            supply_d[over, :M] = pd
        merged = _merge_supply(adj_i, supply_i, M)
        graphs.append(PaddedGraph(ids=merged, ep=int(eps[s])))
    return graphs


# ---------------------------------------------------------------------------
# Sharded search
# ---------------------------------------------------------------------------

def sharded_search_step(mesh: Mesh, *, k: int, L: int, metric: Metric,
                        max_hops: int, n_seeds: int = 0):
    """Build the jitted SPMD search step for a given mesh/config.

    Returned fn: (adj [S,N_s,W], base [S,N_s,D], eps [S], offsets [S],
    queries [B,D][, seed_ids [S,C], seed_vecs [S,C,D]])
    -> (ids [B,k] global, dists [B,k]); B must divide by dp. With
    ``n_seeds > 0`` every shard seeds each query from its own coarse
    quantizer (one local matmul) before walking its sub-graph.
    """

    def local(adj, base, eps, offsets, queries, seed_ids=None,
              seed_vecs=None):
        # one shard's block: leading axis length 1 under shard_map
        init_ids = init_d = None
        if n_seeds:
            from ..ops.distance import pairwise_scores
            d = pairwise_scores(queries, seed_vecs[0], metric)   # [B, C]
            d = jnp.where(seed_ids[0][None, :] == PAD, jnp.inf, d)
            neg_top, pos = jax.lax.top_k(-d, n_seeds)
            init_d = -neg_top
            init_ids = jnp.where(
                jnp.isfinite(init_d),
                jnp.clip(seed_ids[0][pos], 0, adj.shape[1] - 1),
                jnp.int32(2**31 - 1))
            init_d = jnp.where(jnp.isfinite(init_d), init_d, jnp.inf)
        res = beam_search_batch(
            adj[0], base[0], queries, eps[0],
            k=k, L=L, metric=metric, max_hops=max_hops,
            init_ids=init_ids, init_dists=init_d)
        gids = jnp.where(res.ids >= 0, res.ids + offsets[0], jnp.int32(BIG))
        gd = jnp.where(res.ids >= 0, res.dists, jnp.inf)
        # global top-k merge across the shard axis (rides ICI)
        all_i = jax.lax.all_gather(gids, "shard")   # [S, B, k]
        all_d = jax.lax.all_gather(gd, "shard")
        Bq = queries.shape[0]
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(Bq, -1)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(Bq, -1)
        sd, si = jax.lax.sort((all_d, all_i), num_keys=2)
        out_i = jnp.where(si[:, :k] == BIG, -1, si[:, :k])
        # per-shard work counters (observability: device balance)
        return (out_i, sd[:, :k], res.cmps[None, :], res.hops[None, :])

    specs = [P("shard"), P("shard"), P("shard"), P("shard"), P("dp")]
    if n_seeds:
        specs += [P("shard"), P("shard")]
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=tuple(specs),
        out_specs=(P("dp"), P("dp"), P("shard", "dp"), P("shard", "dp")),
        check_vma=False)
    return jax.jit(fn)


def sharded_search(index: ShardedRoarGraph, queries, cfg: SearchConfig,
                   mesh: Mesh | None = None, *, with_stats: bool = False):
    """Host wrapper: place arrays on the mesh and run the SPMD step.

    ``with_stats=True`` additionally returns per-shard work counters
    (cmps [S, Q], hops [S, Q]) for device-balance observability."""
    S = index.num_shards
    if mesh is None:
        mesh = make_mesh(S, 1)
    dp = mesh.shape["dp"]
    queries = np.asarray(queries)
    Q = queries.shape[0]
    pad = (-Q) % dp
    if pad:
        queries = np.concatenate(
            [queries, np.zeros((pad, queries.shape[1]), queries.dtype)])
    n_seeds = cfg.n_seeds if index.seed_ids is not None else 0
    step = sharded_search_step(mesh, k=cfg.k, L=cfg.L_pq, metric=cfg.metric,
                               max_hops=cfg.effective_max_hops,
                               n_seeds=n_seeds)
    args = [jnp.asarray(index.adj), jnp.asarray(index.base),
            jnp.asarray(index.eps), jnp.asarray(index.offsets),
            jnp.asarray(queries)]
    if n_seeds:
        args += [jnp.asarray(index.seed_ids), jnp.asarray(index.seed_vecs)]
    ids, dists, cmps, hops = step(*args)
    ids, dists = np.asarray(ids), np.asarray(dists)
    if with_stats:
        return (ids[:Q], dists[:Q], np.asarray(cmps)[:, :Q],
                np.asarray(hops)[:, :Q])
    return ids[:Q], dists[:Q]


# ---------------------------------------------------------------------------
# Two-level (multi-slice) search: ICI merge within a slice, k-sized DCN merge
# ---------------------------------------------------------------------------

def make_mesh2(n_slice: int, n_shard: int, n_dp: int = 1,
               devices: Sequence | None = None) -> Mesh:
    """Two-level mesh for DCN multi-slice serving (DESIGN.md): the leading
    ``slice`` axis maps to ICI-connected slices joined by DCN; ``shard`` is
    the intra-slice base partition."""
    need = n_slice * n_shard * n_dp
    devs = np.array(devices if devices is not None else jax.devices()[:need])
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(n_slice, n_dp, n_shard),
                ("slice", "dp", "shard"))


def sharded_search_2level_step(mesh: Mesh, *, k: int, L: int, metric: Metric,
                               max_hops: int):
    """SPMD step over a ``("slice", "dp", "shard")`` mesh.

    Collective schedule (DESIGN.md "DCN multi-slice"): per-device beam
    search; ``all_gather`` over ``shard`` (ICI) + two-key sort for the
    intra-slice top-k; ONE ``all_gather`` over ``slice`` (DCN) of the
    already-merged ``[B, k]`` pairs + a final sort. Only k-sized results
    cross the slice axis. Top-k of per-slice top-ks equals the global
    top-k, so results are identical to the flat single-axis merge.
    """

    def local(adj, base, eps, offsets, queries):
        res = beam_search_batch(
            adj[0], base[0], queries, eps[0],
            k=k, L=L, metric=metric, max_hops=max_hops)
        gids = jnp.where(res.ids >= 0, res.ids + offsets[0], jnp.int32(BIG))
        gd = jnp.where(res.ids >= 0, res.dists, jnp.inf)
        Bq = queries.shape[0]

        def merge(all_i, all_d):
            ai = jnp.moveaxis(all_i, 0, 1).reshape(Bq, -1)
            ad = jnp.moveaxis(all_d, 0, 1).reshape(Bq, -1)
            sd, si = jax.lax.sort((ad, ai), num_keys=2)
            return si[:, :k], sd[:, :k]

        # (1) intra-slice merge: rides ICI, per-candidate traffic stays local
        si, sd = merge(jax.lax.all_gather(gids, "shard"),
                       jax.lax.all_gather(gd, "shard"))
        # (2) cross-slice merge: ONE k-sized all_gather over DCN
        si, sd = merge(jax.lax.all_gather(si, "slice"),
                       jax.lax.all_gather(sd, "slice"))
        return jnp.where(si == BIG, -1, si), sd

    shard2 = P(("slice", "shard"))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(shard2, shard2, shard2, shard2, P("dp")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False)
    return jax.jit(fn)


def sharded_search_2level(index: ShardedRoarGraph, queries,
                          cfg: SearchConfig, mesh: Mesh):
    """Search a ShardedRoarGraph over a two-level ``make_mesh2`` mesh.

    ``index.num_shards`` must equal ``n_slice * n_shard``; shard s of slice
    t owns global shard ``t * n_shard + s`` (contiguous two-level
    partition). Returns (ids [Q, k] global, dists [Q, k]) — identical to
    :func:`sharded_search` on the same partition."""
    S = index.num_shards
    n_slice = mesh.shape["slice"]
    n_shard = mesh.shape["shard"]
    if S != n_slice * n_shard:
        raise ValueError(f"index has {S} shards, mesh wants "
                         f"{n_slice}x{n_shard}")
    dp = mesh.shape["dp"]
    queries = np.asarray(queries)
    Q = queries.shape[0]
    pad = (-Q) % dp
    if pad:
        queries = np.concatenate(
            [queries, np.zeros((pad, queries.shape[1]), queries.dtype)])
    step = sharded_search_2level_step(
        mesh, k=cfg.k, L=cfg.L_pq, metric=cfg.metric,
        max_hops=cfg.effective_max_hops)
    ids, dists = step(jnp.asarray(index.adj), jnp.asarray(index.base),
                      jnp.asarray(index.eps), jnp.asarray(index.offsets),
                      jnp.asarray(queries))
    return np.asarray(ids)[:Q], np.asarray(dists)[:Q]


# ---------------------------------------------------------------------------
# Sharded tile engine (the serving answer at scale — SPMD over shards)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ShardedTileIndex:
    """S per-shard :class:`~roargraph_tpu.tiles.TileIndex` stacks.

    Stacked layout with a leading shard axis; shards are padded to the max
    per-shard cluster count (``n_clusters[s]`` live clusters each):
      tiles_t   [S, K, D_pad, C] transposed scan layout (upload() form)
      gids      [S, K, C] int32 shard-LOCAL ids (PAD-filled)
      centroids [S, K, D]
      adj       [S, K, Mc] int32
      norms     [S, K, C] f32 |v|^2 (L2 score term)
      offsets   [S] global id of each shard's first row
      n_clusters [S] live clusters per shard
      scales    [S, K] f32 per-cluster dequant scale, present iff tiles_t
                is int8 (per-shard :meth:`TileIndex.quantize_int8`)
    """
    tiles_t: np.ndarray
    gids: np.ndarray
    centroids: np.ndarray
    adj: np.ndarray
    norms: np.ndarray
    offsets: np.ndarray
    n_clusters: np.ndarray
    scales: np.ndarray | None = None

    @property
    def num_shards(self) -> int:
        return self.tiles_t.shape[0]

    def save_npz(self, path: str) -> None:
        extra = {} if self.scales is None else dict(scales=self.scales)
        np.savez_compressed(
            path, tiles_t=self.tiles_t, gids=self.gids,
            centroids=self.centroids, adj=self.adj, norms=self.norms,
            offsets=self.offsets, n_clusters=self.n_clusters, **extra)

    @staticmethod
    def load_npz(path: str) -> "ShardedTileIndex":
        with np.load(path) as z:
            return ShardedTileIndex(
                z["tiles_t"], z["gids"], z["centroids"], z["adj"],
                z["norms"], z["offsets"], z["n_clusters"],
                scales=z["scales"] if "scales" in z else None)


def build_sharded_tiles(index: ShardedRoarGraph, *, cluster_size: int = 256,
                        Mc: int = 32, metric: Metric | str = Metric.IP,
                        fill: float = 0.75, tile_dtype=None,
                        verbose: bool = False) -> ShardedTileIndex:
    """Build one tile index per shard of a :class:`ShardedRoarGraph`.

    Each shard's clustering/adjacency is the single-device
    :func:`~roargraph_tpu.tiles.build_tiles` over that shard's sub-graph —
    the sharded tile search then scans each shard's clusters on its own
    device and merges global top-k over ICI, giving the tile engine (the
    measured serving winner at 1M+, BASELINE.md) the same scale-out path as
    the flat engine."""
    from ..tiles import TileIndex, build_tiles, _pad_d, _to_scan_layout

    metric = Metric.parse(metric)
    S = index.num_shards
    per_shard: list[TileIndex] = []
    for s in range(S):
        size = int(index.shard_sizes[s])
        shard_base = index.base[s, :size]
        adj = index.adj[s, :size]
        from ..graph import PaddedGraph
        g = PaddedGraph(ids=np.asarray(adj), ep=int(index.eps[s]))
        ti = build_tiles(g, shard_base, cluster_size=cluster_size, Mc=Mc,
                         metric=metric, fill=fill)
        if tile_dtype is not None:
            ti = ti.astype(tile_dtype)  # "int8" routes to quantize_int8()
        per_shard.append(ti)
        if verbose:
            print(f"shard {s}: {ti.num_clusters} clusters of "
                  f"{ti.cluster_size}")

    K = max(t.num_clusters for t in per_shard)
    C = cluster_size
    D = index.base.shape[2]
    Dp = _pad_d(D)
    dt = per_shard[0].tiles.dtype
    quantized = per_shard[0].scales is not None
    tiles_t = np.zeros((S, K, Dp, C), dt)
    gids = np.full((S, K, C), PAD, np.int32)
    cents = np.zeros((S, K, D), np.float32)
    adj = np.full((S, K, Mc), PAD, np.int32)
    norms = np.zeros((S, K, C), np.float32)
    # padding clusters keep scale 1.0 so their (zero) dots stay finite
    scales = np.ones((S, K), np.float32) if quantized else None
    for s, ti in enumerate(per_shard):
        kk = ti.num_clusters
        sc = None if ti.scales is None else jnp.asarray(ti.scales)
        tt, nn = _to_scan_layout(jnp.asarray(ti.tiles), Dp=Dp, scales=sc)
        tiles_t[s, :kk] = np.asarray(tt)
        norms[s, :kk] = np.asarray(nn)
        gids[s, :kk] = ti.gids
        cents[s, :kk] = ti.centroids
        adj[s, :kk, : ti.adj.shape[1]] = ti.adj
        if quantized:
            scales[s, :kk] = ti.scales
    return ShardedTileIndex(
        tiles_t=tiles_t, gids=gids, centroids=cents, adj=adj, norms=norms,
        offsets=np.asarray(index.offsets, np.int32),
        n_clusters=np.array([t.num_clusters for t in per_shard], np.int32),
        scales=scales)


def sharded_tile_search_step(mesh: Mesh, *, k: int, T: int, Lc: int,
                             metric: Metric, scan_impl: str = "grouped",
                             has_nbr_table: bool = False,
                             has_scales: bool = False,
                             nbr_impl: str = "auto",
                             merge_every: int = 1,
                             dedup_impl: str = "compare",
                             expand_batch: int = 1):
    """SPMD tile search: per-shard tile walk (local clusters only, masked by
    ``n_clusters``), then ONE ``all_gather`` of the [B, k] per-shard results
    over the shard axis + a two-key sort — the identical merge schedule as
    :func:`sharded_search_step`, applied to the serving engine.

    ``has_nbr_table``: two extra sharded inputs (adj_cents [S, K, Mc, D],
    adj_cnorms [S, K, Mc]) feed the dense neighbor-score path — the large-K
    configuration, where the per-element score gather would dominate the
    hop on every shard. ``has_scales``: one extra sharded input
    (scales [S, K], int8 tiles) — per-shard dots are descaled locally, so
    the cross-shard merge compares absolute (dequantized) scores."""
    from ..tiles import tile_search_batch

    def local(tiles_t, gids, cents, adj, norms, offsets, ncl, *rest):
        rest = list(rest)
        queries = rest.pop()
        ac = acn = sc = None
        if has_nbr_table:
            ac, acn = rest[0][0], rest[1][0]
            rest = rest[2:]
        if has_scales:
            sc = rest[0][0]
        ids, d, cmps, hops = tile_search_batch(
            tiles_t[0], gids[0], cents[0], adj[0], queries, norms[0],
            ac, acn, sc,
            k=k, T=T, Lc=Lc, metric=metric, scan_impl=scan_impl,
            valid_clusters=ncl[0], nbr_impl=nbr_impl,
            merge_every=merge_every, dedup_impl=dedup_impl,
            expand_batch=expand_batch)
        gid = jnp.where(ids >= 0, ids + offsets[0], jnp.int32(BIG))
        gd = jnp.where(ids >= 0, d, jnp.inf)
        all_i = jax.lax.all_gather(gid, "shard")            # [S, B, k]
        all_d = jax.lax.all_gather(gd, "shard")
        Bq = queries.shape[0]
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(Bq, -1)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(Bq, -1)
        sd, si = jax.lax.sort((all_d, all_i), num_keys=2)
        out_i = jnp.where(si[:, :k] == BIG, -1, si[:, :k])
        return out_i, sd[:, :k], cmps[None, :], hops[None, :]

    n_sharded = 7 + (2 if has_nbr_table else 0) + (1 if has_scales else 0)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("shard"),) * n_sharded + (P("dp"),),
        out_specs=(P("dp"), P("dp"), P("shard", "dp"), P("shard", "dp")),
        check_vma=False)
    return jax.jit(fn)


def sharded_tile_search(index: ShardedTileIndex, queries, *, k: int = 10,
                        T: int = 8, Lc: int | None = None,
                        metric: Metric | str = Metric.IP,
                        mesh: Mesh | None = None,
                        scan_impl: str = "grouped",
                        with_stats: bool = False,
                        nbr_table: bool | None = None,
                        nbr_impl: str = "auto",
                        merge_every: int = 1,
                        dedup_impl: str = "compare",
                        expand_batch: int = 1):
    """Host wrapper for the SPMD tile search. Returns (ids [Q, k] global,
    dists [Q, k]); ``with_stats=True`` adds per-shard (cmps, hops).

    ``nbr_table`` mirrors :func:`roargraph_tpu.tiles.upload`: default builds
    the pre-gathered neighbor-centroid table whenever per-shard K is past
    the one-hot lookup's buffer budget."""
    metric = Metric.parse(metric)
    S = index.num_shards
    if mesh is None:
        mesh = make_mesh(S, 1)
    dp = mesh.shape["dp"]
    queries = np.asarray(queries)
    Q = queries.shape[0]
    pad = (-Q) % dp
    if pad:
        queries = np.concatenate(
            [queries, np.zeros((pad, queries.shape[1]), queries.dtype)])
    Lc = Lc or 2 * T
    K, Mc = index.adj.shape[1:]
    if nbr_table is None:
        nbr_table = 8192 * Mc * K * 4 > (1 << 30)
    extra = ()
    if nbr_table:
        safe = np.clip(index.adj, 0, K - 1)
        ac = index.centroids[np.arange(S)[:, None, None], safe]
        ac = np.where((index.adj == PAD)[..., None], 0.0, ac)  # [S,K,Mc,D]
        # centroid table stays float even for int8 tiles (Mc/C-th the size,
        # only ranks the frontier) — mirrors tiles.upload()
        cdt = (jnp.bfloat16 if index.scales is not None
               else index.tiles_t.dtype)
        extra = (jnp.asarray(ac, dtype=cdt),
                 jnp.asarray((ac.astype(np.float32) ** 2).sum(axis=3)))
    if index.scales is not None:
        extra = extra + (jnp.asarray(index.scales),)
    step = sharded_tile_search_step(mesh, k=k, T=T, Lc=Lc, metric=metric,
                                    scan_impl=scan_impl,
                                    has_nbr_table=nbr_table,
                                    has_scales=index.scales is not None,
                                    nbr_impl=nbr_impl,
                                    merge_every=merge_every,
                                    dedup_impl=dedup_impl,
                                    expand_batch=expand_batch)
    ids, d, cmps, hops = step(
        jnp.asarray(index.tiles_t), jnp.asarray(index.gids),
        jnp.asarray(index.centroids), jnp.asarray(index.adj),
        jnp.asarray(index.norms), jnp.asarray(index.offsets),
        jnp.asarray(index.n_clusters), *extra, jnp.asarray(queries))
    ids, d = np.asarray(ids), np.asarray(d)
    if with_stats:
        return (ids[:Q], d[:Q], np.asarray(cmps)[:, :Q],
                np.asarray(hops)[:, :Q])
    return ids[:Q], d[:Q]


# ---------------------------------------------------------------------------
# Sharded groundtruth (base-sharded exact k-NN)
# ---------------------------------------------------------------------------

def sharded_knn_step(mesh: Mesh, *, k: int, metric: Metric, tile: int = 2048):
    """SPMD exact k-NN: base sharded over 'shard', queries over 'dp'."""
    from ..ops.topk import knn_tiled

    def local(queries, base, offsets, sizes):
        ids, d = knn_tiled(queries, base[0], k=k, metric=metric, tile=tile)
        # Padding rows beyond a shard's true size would otherwise score
        # finitely (0 for IP, |q|^2 for L2) and displace genuine neighbors
        # inside the per-shard top-k before the validity mask runs.
        valid = ids < sizes[0]
        gids = jnp.where(valid, ids + offsets[0], jnp.int32(BIG))
        gd = jnp.where(valid, d, jnp.inf)
        all_i = jax.lax.all_gather(gids, "shard")
        all_d = jax.lax.all_gather(gd, "shard")
        Bq = queries.shape[0]
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(Bq, -1)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(Bq, -1)
        sd, si = jax.lax.sort((all_d, all_i), num_keys=2)
        return si[:, :k], sd[:, :k]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("shard"), P("shard"), P("shard")),
        out_specs=(P("dp"), P("dp")),
        check_vma=False)
    return jax.jit(fn)


def sharded_knn(queries, base, k: int, metric, mesh: Mesh | None = None,
                tile: int = 2048):
    """Exact k-NN with the base set sharded across devices."""
    metric = Metric.parse(metric)
    base = np.asarray(base)
    queries = np.asarray(queries)
    if mesh is None:
        mesh = make_mesh(len(jax.devices()), 1)
    S = mesh.shape["shard"]
    dp = mesh.shape["dp"]
    N, D = base.shape
    n_s = (N + S - 1) // S
    sizes = np.array([max(0, min(n_s, N - s * n_s)) for s in range(S)],
                     np.int32)
    offsets = np.arange(S, dtype=np.int32) * n_s
    # Pad with +inf rows: knn_tiled masks non-finite scores to +inf, so
    # padding can never displace genuine neighbors inside a shard's top-k
    # (zero rows would score finitely — 0 for IP, |q|^2 for L2).
    padded = np.full((S, n_s, D), np.inf, base.dtype)
    for s in range(S):
        if sizes[s]:
            padded[s, : sizes[s]] = base[s * n_s: s * n_s + sizes[s]]
    Q = queries.shape[0]
    pad = (-Q) % dp
    if pad:
        queries = np.concatenate(
            [queries, np.zeros((pad, D), queries.dtype)])
    step = sharded_knn_step(mesh, k=k, metric=metric, tile=tile)
    ids, d = step(jnp.asarray(queries), jnp.asarray(padded),
                  jnp.asarray(offsets), jnp.asarray(sizes))
    return np.asarray(ids)[:Q], np.asarray(d)[:Q]
