"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest
import jax

import roargraph_tpu as rt
from roargraph_tpu.dist import (build_sharded, make_mesh, sharded_knn,
                                sharded_search)
from roargraph_tpu.ops.topk import knn
from roargraph_tpu import eval as reval
from tests.conftest import make_crossmodal

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_knn_matches_single_device(rng):
    base = rng.standard_normal((500, 16)).astype(np.float32)
    q = rng.standard_normal((40, 16)).astype(np.float32)
    mesh = make_mesh(4, 2)
    ids, d = sharded_knn(q, base, k=10, metric="ip", mesh=mesh, tile=64)
    ref_ids, ref_d = knn(q, base, k=10, metric="ip")
    np.testing.assert_array_equal(ids, ref_ids.astype(np.int64))
    np.testing.assert_allclose(d, ref_d, rtol=1e-5, atol=1e-5)


def test_sharded_search_recall(rng):
    base, train_q = make_crossmodal(rng, n_base=900, n_query=700, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=64, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    mesh = make_mesh(4, 2)
    scfg = rt.SearchConfig(k=10, L_pq=40, metric="ip")
    ids, dists = sharded_search(index, eval_q, scfg, mesh=mesh)

    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
    rec = reval.recall_at_k(ids, gt_ids, 10)
    # each shard is searched exhaustively-ish at this scale; the merged
    # global top-k should be strong
    assert rec > 0.8, rec
    assert (np.diff(dists, axis=1) >= -1e-6).all()


def test_sharded_search_global_ids_valid(rng):
    base, train_q = make_crossmodal(rng, n_base=300, n_query=200, dim=8)
    cfg = rt.BuildConfig(metric="l2", M_sq=10, M_pjbp=4, L_pjpq=16,
                         prune_batch=128, search_batch=64)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="l2")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=2)
    mesh = make_mesh(2, 1)
    eval_q = make_crossmodal(rng, n_base=1, n_query=16, dim=8)[1]
    ids, _ = sharded_search(index, eval_q,
                            rt.SearchConfig(k=5, L_pq=16, metric="l2"),
                            mesh=mesh)
    assert (ids >= 0).all() and (ids < 300).all()
    # results from both shards appear
    assert (ids < 150).any() and (ids >= 150).any()


def test_spmd_build_matches_sequential(rng):
    """The SPMD sharded build (per-shard local kNN + phase-A prune in one
    shard_map program) must produce bit-identical per-shard graphs to the
    sequential host loop."""
    base, train_q = make_crossmodal(rng, n_base=640, n_query=320, dim=16)
    cfg = rt.BuildConfig(metric="ip", M_sq=16, M_pjbp=5, L_pjpq=24,
                         prune_batch=64, search_batch=64)
    mesh = make_mesh(4, 1)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip", tile=2048)[0]

    seq = build_sharded(base, knn_fn, cfg, n_shards=4)
    spmd = build_sharded(base, None, cfg, n_shards=4,
                         train_queries=train_q, mesh=mesh)
    np.testing.assert_array_equal(seq.adj, spmd.adj)
    np.testing.assert_array_equal(seq.eps, spmd.eps)
    np.testing.assert_array_equal(seq.offsets, spmd.offsets)
    np.testing.assert_allclose(seq.base, spmd.base)


def test_spmd_phase_b_matches_sequential(rng):
    """Full SPMD build — phase A AND phase B under shard_map — must be
    bit-identical to the sequential per-shard host loop, including with a
    ragged final shard (N % S != 0: last shard short, so the lockstep
    phase-B trip count includes fully masked batches) and a multi-call
    checkpoint-style host loop (phase_b_steps_per_call)."""
    base, train_q = make_crossmodal(rng, n_base=610, n_query=320, dim=16)
    cfg = rt.BuildConfig(metric="ip", M_sq=16, M_pjbp=5, L_pjpq=24,
                         prune_batch=64, search_batch=64)
    mesh = make_mesh(4, 1)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip", tile=2048)[0]

    seq = build_sharded(base, knn_fn, cfg, n_shards=4)
    spmd = build_sharded(base, None, cfg, n_shards=4,
                         train_queries=train_q, mesh=mesh,
                         spmd_phase_b=True, phase_b_steps_per_call=2)
    np.testing.assert_array_equal(seq.adj, spmd.adj)
    np.testing.assert_array_equal(seq.eps, spmd.eps)
    np.testing.assert_array_equal(seq.shard_sizes, spmd.shard_sizes)
    assert spmd.shard_sizes[-1] < spmd.shard_sizes[0]  # ragged case exercised

    # the SPMD-built ragged index must serve end-to-end
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    ids, dists = sharded_search(
        spmd, eval_q, rt.SearchConfig(k=10, L_pq=30, metric="ip"),
        mesh=make_mesh(4, 2))
    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
    assert (ids >= 0).all() and (ids < 610).all()
    assert reval.recall_at_k(ids, gt_ids, 10) > 0.8


def test_two_level_merge_matches_flat(rng):
    """DCN multi-slice schedule (DESIGN.md): the two-level merge (ICI
    all_gather over 'shard', then ONE k-sized all_gather over 'slice') must
    return exactly the flat single-axis merge on the same 8-shard
    partition — top-k of per-slice top-ks is the global top-k."""
    from roargraph_tpu.dist import make_mesh2, sharded_search_2level

    base, train_q = make_crossmodal(rng, n_base=960, n_query=600, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=16, M_pjbp=5, L_pjpq=24,
                         prune_batch=128, search_batch=64)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=8)
    scfg = rt.SearchConfig(k=10, L_pq=24, metric="ip")
    flat_ids, flat_d = sharded_search(index, eval_q, scfg,
                                      mesh=make_mesh(8, 1))
    two_ids, two_d = sharded_search_2level(index, eval_q, scfg,
                                           mesh=make_mesh2(2, 4, 1))
    np.testing.assert_array_equal(flat_ids, two_ids)
    np.testing.assert_allclose(flat_d, two_d, rtol=1e-6, atol=1e-6)
    four_ids, _ = sharded_search_2level(index, eval_q, scfg,
                                        mesh=make_mesh2(4, 2, 1))
    np.testing.assert_array_equal(flat_ids, four_ids)


def test_sharded_tile_search_matches_single_device(rng):
    """SPMD tile search (per-shard tile walk + all_gather k-merge) must be
    bit-identical to running the single-device tile engine on each shard
    and merging on the host — including with a ragged last shard and
    per-shard cluster counts that differ (stacking padding masked by
    n_clusters)."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search
    from roargraph_tpu.tiles import build_tiles, tile_search
    from roargraph_tpu.graph import PaddedGraph

    base, train_q = make_crossmodal(rng, n_base=910, n_query=600, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=48, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    assert index.shard_sizes[-1] < index.shard_sizes[0]
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip",
                                fill=0.75)
    T = 6
    ids, dists = sharded_tile_search(stidx, eval_q, k=10, T=T, metric="ip",
                                     mesh=make_mesh(4, 2))

    # single-device reference: same per-shard tile indexes (build_tiles is
    # deterministic), searched one shard at a time, merged on the host
    all_i, all_d = [], []
    for s in range(4):
        size = int(index.shard_sizes[s])
        g = PaddedGraph(ids=index.adj[s, :size], ep=int(index.eps[s]))
        ti = build_tiles(g, index.base[s, :size], cluster_size=64, Mc=8,
                         metric="ip", fill=0.75)
        si, sd, _, _ = tile_search(ti, eval_q, k=10, T=T, Lc=2 * T,
                                   metric="ip")
        gid = np.where(si >= 0, si.astype(np.int64) + index.offsets[s],
                       np.int64(2**31 - 1))
        all_i.append(gid)
        all_d.append(np.where(si >= 0, sd, np.inf))
    cat_i = np.concatenate(all_i, axis=1)
    cat_d = np.concatenate(all_d, axis=1)
    order = np.lexsort((cat_i, cat_d), axis=1)
    ref_i = np.take_along_axis(cat_i, order, axis=1)[:, :10]
    ref_d = np.take_along_axis(cat_d, order, axis=1)[:, :10]
    ref_i = np.where(ref_i == 2**31 - 1, -1, ref_i)
    np.testing.assert_array_equal(ids, ref_i)
    np.testing.assert_allclose(dists, np.where(np.isfinite(ref_d), ref_d,
                                               np.inf), rtol=1e-6)

    # and the merged result is a sane global search
    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
    assert reval.recall_at_k(ids, gt_ids, 10) > 0.7


def test_sharded_tile_search_int8(rng, tmp_path):
    """int8 sharded tiles: the SPMD search (per-shard descale + cross-shard
    merge in absolute units) must be bit-identical to host-merging the
    single-device int8 tile engine over the same shards, and the stacked
    layout must roundtrip scales through save/load."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search
    from roargraph_tpu.dist.sharded import ShardedTileIndex
    from roargraph_tpu.tiles import build_tiles, tile_search
    from roargraph_tpu.graph import PaddedGraph

    base, train_q = make_crossmodal(rng, n_base=910, n_query=600, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=48, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip",
                                fill=0.75, tile_dtype="int8")
    assert stidx.tiles_t.dtype == np.int8 and stidx.scales.shape[0] == 4

    p = str(tmp_path / "stiles8.npz")
    stidx.save_npz(p)
    st2 = ShardedTileIndex.load_npz(p)
    np.testing.assert_array_equal(st2.tiles_t, stidx.tiles_t)
    np.testing.assert_allclose(st2.scales, stidx.scales)

    T = 6
    ids, dists = sharded_tile_search(st2, eval_q, k=10, T=T, metric="ip",
                                     mesh=make_mesh(4, 2))

    all_i, all_d = [], []
    for s in range(4):
        size = int(index.shard_sizes[s])
        g = PaddedGraph(ids=index.adj[s, :size], ep=int(index.eps[s]))
        ti = build_tiles(g, index.base[s, :size], cluster_size=64, Mc=8,
                         metric="ip", fill=0.75).quantize_int8()
        si, sd, _, _ = tile_search(ti, eval_q, k=10, T=T, Lc=2 * T,
                                   metric="ip")
        gid = np.where(si >= 0, si.astype(np.int64) + index.offsets[s],
                       np.int64(2**31 - 1))
        all_i.append(gid)
        all_d.append(np.where(si >= 0, sd, np.inf))
    cat_i = np.concatenate(all_i, axis=1)
    cat_d = np.concatenate(all_d, axis=1)
    order = np.lexsort((cat_i, cat_d), axis=1)
    ref_i = np.take_along_axis(cat_i, order, axis=1)[:, :10]
    ref_d = np.take_along_axis(cat_d, order, axis=1)[:, :10]
    ref_i = np.where(ref_i == 2**31 - 1, -1, ref_i)
    np.testing.assert_array_equal(ids, ref_i)
    np.testing.assert_allclose(dists, np.where(np.isfinite(ref_d), ref_d,
                                               np.inf), rtol=1e-5)

    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
    assert reval.recall_at_k(ids, gt_ids, 10) > 0.7


def test_sharded_search_with_seeds(rng):
    base, train_q = make_crossmodal(rng, n_base=600, n_query=500, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=48, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4, seed_centroids=16)
    assert index.seed_ids is not None and index.seed_ids.shape[0] == 4
    mesh = make_mesh(4, 2)
    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")

    plain = sharded_search(index, eval_q,
                           rt.SearchConfig(k=10, L_pq=40, metric="ip"),
                           mesh=mesh)
    seeded = sharded_search(index, eval_q,
                            rt.SearchConfig(k=10, L_pq=40, metric="ip",
                                            n_seeds=4),
                            mesh=mesh)
    r_plain = reval.recall_at_k(plain[0], gt_ids, 10)
    r_seed = reval.recall_at_k(seeded[0], gt_ids, 10)
    assert r_seed >= r_plain - 0.05, (r_seed, r_plain)
    for row in seeded[0]:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_sharded_tile_search_dense_nbr(rng):
    """The SPMD tile search with the pre-gathered neighbor-centroid table
    (the large-K serving configuration, forced on at test shapes) must
    return the same result sets as the default lookup — the dense path
    re-scores the same centroids, so only near-tie frontier order can
    differ."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search

    base, train_q = make_crossmodal(rng, n_base=700, n_query=500, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip")
    mesh = make_mesh(4, 2)
    a_ids, _ = sharded_tile_search(stidx, eval_q, k=10, T=6, metric="ip",
                                   mesh=mesh)
    b_ids, _ = sharded_tile_search(stidx, eval_q, k=10, T=6, metric="ip",
                                   mesh=mesh, nbr_table=True,
                                   nbr_impl="dense")
    same = np.mean([len(set(a_ids[i].tolist()) & set(b_ids[i].tolist())) / 10
                    for i in range(eval_q.shape[0])])
    assert same > 0.99, same


def test_sharded_tile_search_fused_scan(rng):
    """The fused scan+select kernel (in-kernel per-cluster top-p) through
    the SPMD path must match the default scan exactly: per-shard [B, k]
    results are identical, so the cross-shard merge is too."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search

    base, train_q = make_crossmodal(rng, n_base=700, n_query=500, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip")
    mesh = make_mesh(4, 2)
    ref = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                              mesh=mesh)
    got = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                              mesh=mesh,
                              scan_impl="grouped_pallas_fused_interpret")
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-5, atol=1e-6)


def test_sharded_tile_search_merge_every(rng):
    """Deferring the per-shard running top-k merge (merge_every) must be
    bit-identical through the SPMD path too: the cross-shard all_gather
    merge sees the same per-shard [B, k] results."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search

    base, train_q = make_crossmodal(rng, n_base=700, n_query=500, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip")
    mesh = make_mesh(4, 2)
    ref = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                              mesh=mesh)
    got = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                              mesh=mesh, merge_every=3)
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])


def test_sharded_tile_search_flags_expand_batch(rng):
    """The large-T serving modes (bitmap dedup + batched expansion) through
    the SPMD path: flags alone must match the compare-dedup walk here (no
    queue-bottom evictions at these shapes); expand_batch reads a stale
    frontier, so it is held to recall parity, not bit-identity."""
    from roargraph_tpu.dist import build_sharded_tiles, sharded_tile_search

    base, train_q = make_crossmodal(rng, n_base=700, n_query=500, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=32, dim=16)[1]
    cfg = rt.BuildConfig(metric="ip", M_sq=20, M_pjbp=6, L_pjpq=30,
                         prune_batch=256, search_batch=128)

    def knn_fn(shard):
        return knn(train_q, shard, k=cfg.M_sq, metric="ip")[0]

    index = build_sharded(base, knn_fn, cfg, n_shards=4)
    stidx = build_sharded_tiles(index, cluster_size=64, Mc=8, metric="ip")
    mesh = make_mesh(4, 2)
    ref = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                              mesh=mesh)
    fl = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                             mesh=mesh, dedup_impl="flags")
    np.testing.assert_array_equal(fl[0], ref[0])
    gt_ids = knn(eval_q, base, k=10, metric="ip")[0]

    def rec(ids):
        return np.mean([len(set(ids[i].tolist())
                            & set(np.asarray(gt_ids)[i].tolist())) / 10
                        for i in range(ids.shape[0])])

    eb = sharded_tile_search(stidx, eval_q, k=10, T=7, metric="ip",
                             mesh=mesh, dedup_impl="flags", expand_batch=4)
    assert rec(eb[0]) >= rec(ref[0]) - 0.02
    for row in eb[0]:
        live = row[row >= 0]
        assert len(set(live.tolist())) == live.size
