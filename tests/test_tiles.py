"""Tile-graph engine tests: build invariants, exactness at full scan,
recall behavior vs the brute-force oracle, bf16 storage."""
import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu.build import build_roargraph
from roargraph_tpu.graph import PAD
from roargraph_tpu.ops.topk import knn
from roargraph_tpu.tiles import TileIndex, build_tiles, tile_search

from conftest import make_crossmodal


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    base, queries = make_crossmodal(rng, n_base=2000, n_query=200, dim=16)
    train_q = make_crossmodal(rng, n_base=1, n_query=800, dim=16)[1]
    train_ids, _ = knn(train_q, base, k=32, metric="ip")
    cfg = rt.BuildConfig(metric="ip", M_sq=32, M_pjbp=8, L_pjpq=40,
                         prune_batch=256, search_batch=128)
    graph, _ = build_roargraph(base, train_ids, cfg)
    tidx = build_tiles(graph, base, cluster_size=64, Mc=8, metric="ip")
    gt_ids, _ = knn(queries, base, k=10, metric="ip")
    return base, queries, graph, tidx, gt_ids


def recall(ids, gt_ids, k=10):
    return np.mean([len(set(ids[i, :k].tolist()) &
                        set(gt_ids[i, :k].tolist())) / k
                    for i in range(ids.shape[0])])


def test_build_invariants(setup):
    base, _, _, tidx, _ = setup
    N = base.shape[0]
    K, C = tidx.gids.shape
    assert K == -(-N // int(64 * 0.75))  # default fill=0.75 slack
    flat = tidx.gids[tidx.gids != PAD]
    # every base id exactly once, none invented
    assert flat.size == N
    assert np.array_equal(np.sort(flat), np.arange(N))
    # tiles hold the right vectors
    kk, cc = 3, 0
    gid = tidx.gids[kk, cc]
    assert np.allclose(tidx.tiles[kk, cc], base[gid])
    # adjacency: in range, no self loops
    adj = tidx.adj
    valid = adj != PAD
    assert (adj[valid] >= 0).all() and (adj[valid] < K).all()
    assert not (adj == np.arange(K)[:, None]).any()
    assert 0 <= tidx.ep < K


def test_full_scan_is_exact(setup):
    base, queries, _, tidx, gt_ids = setup
    K = tidx.num_clusters
    ids, dists, cmps, hops = tile_search(
        tidx, queries, k=10, T=K, Lc=K, metric="ip", batch_size=256)
    assert recall(ids, gt_ids) == 1.0
    # every real vector scored exactly once
    assert (cmps == base.shape[0]).all()
    assert (hops == K).all()
    # distances match the oracle
    _, gt_d = knn(queries, base, k=10, metric="ip")
    np.testing.assert_allclose(dists, gt_d, rtol=1e-4, atol=1e-5)


def test_recall_increases_with_T(setup):
    _, queries, _, tidx, gt_ids = setup
    recs = []
    for T in (2, 8, 16):
        ids, _, cmps, hops = tile_search(tidx, queries, k=10, T=T,
                                         Lc=2 * T, metric="ip",
                                         batch_size=256)
        assert (hops == T).all()
        recs.append(recall(ids, gt_ids))
    assert recs[0] <= recs[1] <= recs[2]
    assert recs[-1] > 0.8


def test_graph_mode_vs_ivf(setup):
    _, queries, _, tidx, gt_ids = setup
    ids_g, _, _, _ = tile_search(tidx, queries, k=10, T=8, Lc=16,
                                 metric="ip", use_graph=True, batch_size=256)
    ids_i, _, _, _ = tile_search(tidx, queries, k=10, T=8, Lc=16,
                                 metric="ip", use_graph=False, batch_size=256)
    # both modes must work; graph mode may only help
    assert recall(ids_i, gt_ids) > 0.4
    assert recall(ids_g, gt_ids) >= recall(ids_i, gt_ids) - 0.05


def test_bf16_storage(setup):
    import jax.numpy as jnp
    _, queries, _, tidx, gt_ids = setup
    t16 = tidx.astype(jnp.bfloat16)
    ids, _, _, _ = tile_search(t16, queries, k=10, T=16, Lc=32, metric="ip",
                               batch_size=256)
    ids32, _, _, _ = tile_search(tidx, queries, k=10, T=16, Lc=32,
                                 metric="ip", batch_size=256)
    assert recall(ids, gt_ids) > recall(ids32, gt_ids) - 0.03


def test_int8_quantization_error_bound(setup):
    _, _, _, tidx, _ = setup
    q8 = tidx.quantize_int8()
    assert q8.tiles.dtype == np.int8
    assert q8.scales.shape == (tidx.num_clusters,)
    # symmetric per-cluster quantization: |x - s*q| <= s/2 elementwise
    deq = q8.tiles.astype(np.float32) * q8.scales[:, None, None]
    err = np.abs(deq - tidx.tiles.astype(np.float32))
    assert (err <= q8.scales[:, None, None] * 0.5 + 1e-7).all()
    # idempotent; float recast of a quantized index must refuse
    assert q8.quantize_int8() is q8
    with pytest.raises(ValueError):
        q8.astype(np.float32)


def test_int8_storage_recall_and_scores(setup):
    """int8 tiles: recall within noise of f32; returned dists match the
    dequantized-vector scores exactly (descale correctness)."""
    base, queries, _, tidx, gt_ids = setup
    q8 = tidx.quantize_int8()
    ids8, d8, cmps8, hops8 = tile_search(q8, queries, k=10, T=16, Lc=32,
                                         metric="ip", batch_size=256)
    ids32, _, cmps32, hops32 = tile_search(tidx, queries, k=10, T=16, Lc=32,
                                           metric="ip", batch_size=256)
    assert recall(ids8, gt_ids) > recall(ids32, gt_ids) - 0.03
    # same clusters scanned (frontier rides f32 centroids either way)
    assert np.array_equal(np.asarray(hops8), np.asarray(hops32))
    # score parity vs dequantized vectors for the returned ids
    deq = q8.tiles.astype(np.float32) * q8.scales[:, None, None]
    flat = {int(g): deq[k, c] for k in range(q8.num_clusters)
            for c, g in enumerate(q8.gids[k]) if g != PAD}
    for i in range(0, queries.shape[0], 37):
        for j in range(10):
            g = int(ids8[i, j])
            if g < 0:
                continue
            want = -float(np.dot(queries[i], flat[g]))
            assert abs(float(d8[i, j]) - want) <= 2e-3 * max(1, abs(want))


def test_int8_l2_metric(setup):
    """L2 with int8 tiles: norms are dequantized units, scores consistent."""
    base, queries, _, _, _ = setup
    gt_l2, _ = knn(queries, base, k=10, metric="l2")
    from roargraph_tpu.build import build_roargraph
    # reuse the ip-built graph structure via a fresh tile build under L2
    tidx = build_tiles(_graph_of(setup), base, cluster_size=64, Mc=8,
                       metric="l2")
    q8 = tidx.quantize_int8()
    K = q8.num_clusters
    ids, dists, _, _ = tile_search(q8, queries, k=10, T=K, Lc=K,
                                   metric="l2", batch_size=256)
    assert recall(ids, gt_l2) > 0.97  # full scan, quantization noise only
    deq = q8.tiles.astype(np.float32) * q8.scales[:, None, None]
    flat = {int(g): deq[k, c] for k in range(K)
            for c, g in enumerate(q8.gids[k]) if g != PAD}
    i = 11
    g = int(ids[i, 0])
    want = float(((queries[i] - flat[g]) ** 2).sum())
    assert abs(float(dists[i, 0]) - want) <= 2e-3 * max(1.0, abs(want))


def _graph_of(setup):
    return setup[2]


def test_int8_npz_roundtrip(tmp_path, setup):
    _, _, _, tidx, _ = setup
    q8 = tidx.quantize_int8()
    p = str(tmp_path / "tiles8.npz")
    q8.save_npz(p)
    t2 = TileIndex.load_npz(p)
    assert t2.tiles.dtype == np.int8
    assert np.array_equal(t2.tiles, q8.tiles)
    assert np.allclose(t2.scales, q8.scales)
    assert np.allclose(t2.radii, q8.radii)


def test_merge_every_bit_identical(setup):
    """Deferring the running top-k merge across hops must be bit-identical
    to per-hop merging (the walk ignores rk without early_exit and clusters
    partition the base) — including a T not divisible by merge_every — and
    must refuse the early_exit combination."""
    _, queries, _, tidx, _ = setup
    ref = tile_search(tidx, queries, k=10, T=7, Lc=16, metric="ip",
                      batch_size=256)
    for me in (2, 3, 7, 16):
        got = tile_search(tidx, queries, k=10, T=7, Lc=16, metric="ip",
                          batch_size=256, merge_every=me)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        tile_search(tidx.with_radii(), queries, k=10, T=7, Lc=16,
                    metric="ip", batch_size=256, merge_every=2,
                    early_exit=True)


def test_npz_roundtrip(tmp_path, setup):
    _, _, _, tidx, _ = setup
    p = str(tmp_path / "tiles.npz")
    tidx.save_npz(p)
    t2 = TileIndex.load_npz(p)
    assert np.array_equal(t2.gids, tidx.gids)
    assert np.array_equal(t2.adj, tidx.adj)
    assert t2.ep == tidx.ep
    assert np.allclose(t2.tiles, tidx.tiles)


def test_pallas_scan_matches_xla(setup):
    """The fused DMA scan kernel (interpret mode on CPU) must match the XLA
    gather+dot path: same clusters scanned -> same results."""
    _, queries, _, tidx, gt_ids = setup
    from roargraph_tpu.tiles import upload
    dev = upload(tidx)
    a = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev, scan_impl="xla")
    b = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev,
                    scan_impl="pallas_interpret")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a[2], b[2])


def test_grouped_scan_matches_xla(setup):
    """The cluster-grouped batched-matmul scan (the serving default at
    B >> K) must be bit-identical to the per-query XLA gather+dot path:
    same groups, same dot, gather-based un-permutation."""
    _, queries, _, tidx, gt_ids = setup
    from roargraph_tpu.tiles import upload
    dev = upload(tidx)
    a = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                    batch_size=128, device_arrays=dev, scan_impl="xla")
    b = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                    batch_size=128, device_arrays=dev, scan_impl="grouped")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[3], b[3])


def test_grouped_pallas_scan_matches_grouped(setup):
    """The grouped scan with the tile gather + contraction fused in the
    Pallas kernel (interpret mode on CPU) must match the XLA grouped path:
    identical grouping, same per-group dot."""
    _, queries, _, tidx, gt_ids = setup
    from roargraph_tpu.tiles import upload
    dev = upload(tidx)
    a = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                    batch_size=128, device_arrays=dev, scan_impl="grouped")
    b = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                    batch_size=128, device_arrays=dev,
                    scan_impl="grouped_pallas_interpret")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[3], b[3])


def test_grouped_scan_large_k_regime():
    """K > B (the 10M-serving regime the _num_groups bound unlocks): the
    grouped scans must still match the per-query dot exactly."""
    import jax.numpy as jnp

    from roargraph_tpu.tiles import (_num_groups, _scan_clusters_grouped,
                                     _scan_clusters_grouped_pallas)

    rng = np.random.default_rng(3)
    K, Dp, C, B = 300, 32, 16, 64
    assert _num_groups(K, B, 64) < K  # the bound actually engages
    tiles_t = jnp.asarray(rng.standard_normal((K, Dp, C)).astype(np.float32))
    qp = jnp.asarray(rng.standard_normal((B, Dp)).astype(np.float32))
    f = jnp.asarray(rng.integers(0, K, B).astype(np.int32))
    want = np.einsum("bd,bdc->bc", np.asarray(qp),
                     np.asarray(tiles_t)[np.asarray(f)])
    got = _scan_clusters_grouped(tiles_t, f, qp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    got_p = _scan_clusters_grouped_pallas(tiles_t, f, qp, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), want, rtol=1e-5, atol=1e-5)
    # hot-cluster splitting still correct when one cluster takes many rows
    f_hot = jnp.asarray(np.full(B, 7, np.int32)).at[0].set(5)
    want = np.einsum("bd,bdc->bc", np.asarray(qp),
                     np.asarray(tiles_t)[np.asarray(f_hot)])
    got = _scan_clusters_grouped(tiles_t, f_hot, qp, nq_max=8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_fused_scan_matches_xla(setup):
    """The fused scan+select kernels (in-kernel per-cluster top-p, interpret
    mode on CPU) must produce the same final results as the unfused XLA
    path: per-cluster top-p then global merge is exact for the final top-k
    because clusters partition the base and are expanded at most once."""
    _, queries, _, tidx, gt_ids = setup
    from roargraph_tpu.tiles import upload
    dev = upload(tidx)
    a = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                    batch_size=128, device_arrays=dev, scan_impl="xla")
    for impl in ("pallas_fused_interpret", "grouped_pallas_fused_interpret"):
        b = tile_search(tidx, queries[:128], k=10, T=8, Lc=16, metric="ip",
                        batch_size=128, device_arrays=dev, scan_impl=impl)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(a[2], b[2])
        np.testing.assert_array_equal(a[3], b[3])


def test_fused_scan_merge_every(setup):
    """Deferred merge composes with the fused kernels (group candidates are
    [B, g*p] instead of [B, g*C])."""
    _, queries, _, tidx, gt_ids = setup
    from roargraph_tpu.tiles import upload
    dev = upload(tidx)
    a = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev, scan_impl="xla")
    b = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev,
                    scan_impl="grouped_pallas_fused_interpret", merge_every=3)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)


def test_fused_scan_int8(setup):
    """int8 tiles + fused select: selection happens in raw units (the
    positive per-cluster descale is rank-invariant) and scores are descaled
    outside — results must match the unfused int8 path."""
    _, queries, _, tidx, _ = setup
    from roargraph_tpu.tiles import upload
    q8 = tidx.quantize_int8()
    dev = upload(q8)
    a = tile_search(q8, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev, scan_impl="xla")
    b = tile_search(q8, queries[:64], k=10, T=8, Lc=16, metric="ip",
                    batch_size=64, device_arrays=dev,
                    scan_impl="pallas_fused_interpret")
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6)


def test_fused_scan_l2(setup):
    """L2 fused select: the kernel scores |x|^2 - 2<q,x> from the norms row
    (|q|^2 is rank-neutral, added outside) — same results as unfused L2."""
    base, queries, graph, _, _ = setup
    from roargraph_tpu.tiles import upload
    tidx = build_tiles(graph, base, cluster_size=64, Mc=8, metric="l2")
    dev = upload(tidx)
    a = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="l2",
                    batch_size=64, device_arrays=dev, scan_impl="xla")
    for impl in ("pallas_fused_interpret", "grouped_pallas_fused_interpret"):
        b = tile_search(tidx, queries[:64], k=10, T=8, Lc=16, metric="l2",
                        batch_size=64, device_arrays=dev, scan_impl=impl)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1], rtol=1e-4, atol=1e-5)
    # int8 + L2 fused is rejected (descale is not rank-neutral under the
    # norms offset)
    q8 = tidx.quantize_int8()
    dev8 = upload(q8)
    with pytest.raises(ValueError, match="int8"):
        tile_search(q8, queries[:64], k=10, T=4, Lc=8, metric="l2",
                    batch_size=64, device_arrays=dev8,
                    scan_impl="pallas_fused_interpret")


def test_l2_metric(setup):
    base, queries, graph, _, _ = setup
    tidx = build_tiles(graph, base, cluster_size=64, Mc=8, metric="l2")
    gt_ids, _ = knn(queries, base, k=10, metric="l2")
    ids, _, _, _ = tile_search(tidx, queries, k=10, T=16, Lc=32, metric="l2",
                               batch_size=256)
    assert recall(ids, gt_ids) > 0.8


def test_early_exit_mechanics(setup):
    """Early-exit mechanics: the bound knob trades hops for recall
    monotonically, the auto (conservative) slack never loses recall, and an
    aggressive slack measurably cuts expansions. (The equal-recall win shows
    up once queries CONVERGE within T — the large-N serving regime measured
    in bench.py — so this small fixture pins the machinery, not the
    operating point.) L2 exercises the squared-bound variant."""
    base, queries, graph, tidx, gt_ids = setup
    T = 16
    for metric, ti in (("ip", tidx),
                       ("l2", build_tiles(graph, base, cluster_size=64,
                                          Mc=8, metric="l2"))):
        gt = knn(queries, base, k=10, metric=metric)[0]
        ids_f, _, _, hops_f = tile_search(ti, queries, k=10, T=T, Lc=2 * T,
                                          metric=metric)
        r_f = recall(ids_f, gt)
        prev_hops = 0.0
        for slack in (0.0, 0.3, 1.0):
            ids_a, _, _, hops_a = tile_search(
                ti, queries, k=10, T=T, Lc=2 * T, metric=metric,
                early_exit=True, exit_slack=slack)
            assert hops_a.mean() >= prev_hops - 1e-9
            prev_hops = hops_a.mean()
            if slack == 0.0:
                # kth-result-vs-centroid-score cut: must stop early
                assert hops_a.mean() < hops_f.mean()
            if slack == 1.0:
                # the provable bound can only skip provably useless scans
                assert recall(ids_a, gt) >= r_f - 1e-9


def test_with_radii_bounds_members(setup):
    """Every member's distance to its centroid is within the stored radius
    (the early-exit bound's correctness condition)."""
    _, _, _, tidx, _ = setup
    ti = tidx.with_radii()
    for kk in range(ti.num_clusters):
        m = ti.gids[kk] != PAD
        if not m.any():
            continue
        d = np.linalg.norm(ti.tiles[kk][m].astype(np.float32)
                           - ti.centroids[kk], axis=1)
        assert (d <= ti.radii[kk] + 1e-4).all()


def test_dense_nbr_lookup_parity(setup):
    """The dense neighbor-score path (pre-gathered adj_cents table — the
    large-K serving configuration) must rank the frontier like the onehot /
    gather paths: same dot against the same centroids, so results agree up
    to contraction-order rounding on near-ties. Asserted as identical
    result sets per query (f32, CPU: bitwise-stable)."""
    from roargraph_tpu.tiles import upload
    _, queries, _, tidx, gt_ids = setup
    dev = upload(tidx, nbr_table=True)
    assert dev[5] is not None and dev[6] is not None
    out = {}
    for impl in ("onehot", "gather", "dense"):
        out[impl] = tile_search(tidx, queries, k=10, T=6, Lc=12,
                                metric="ip", batch_size=256,
                                device_arrays=dev, nbr_impl=impl)
    for impl in ("gather", "dense"):
        same = np.mean([
            len(set(out["onehot"][0][i].tolist())
                & set(out[impl][0][i].tolist())) / 10
            for i in range(queries.shape[0])])
        assert same > 0.99, (impl, same)
    # and the dense path must not cost recall
    assert recall(out["dense"][0], gt_ids) >= recall(out["onehot"][0],
                                                     gt_ids) - 0.005


def test_dense_nbr_lookup_l2(setup):
    from roargraph_tpu.tiles import upload
    base, queries, graph, _, _ = setup
    tidx = build_tiles(graph, base, cluster_size=64, Mc=8, metric="l2")
    gt_ids, _ = knn(queries, base, k=10, metric="l2")
    dev = upload(tidx, nbr_table=True)
    a = tile_search(tidx, queries, k=10, T=6, Lc=12, metric="l2",
                    batch_size=256, device_arrays=dev, nbr_impl="onehot")
    b = tile_search(tidx, queries, k=10, T=6, Lc=12, metric="l2",
                    batch_size=256, device_arrays=dev, nbr_impl="dense")
    assert recall(b[0], gt_ids) >= recall(a[0], gt_ids) - 0.005


def test_balanced_assign_spill_passes(capfd):
    """Capacity overflow path of ``_balanced_assign`` (the 10M defect):
    a point mass whose every candidate centroid fills must be re-ranked
    against clusters with free capacity (spill passes), never dumped into
    arbitrary slots — arbitrary placement destroys tile geometry and
    capped 10M recall at 0.40 (DESIGN.md round-4 notes)."""
    from roargraph_tpu.tiles import _balanced_assign

    rng = np.random.default_rng(3)
    n, d, K, cap = 4096, 8, 32, 144  # K*cap = 4608 >= n
    heavy = n * 6 // 10  # 60% of points near-coincident: their n_choices=2
    # nearest centroids saturate after 2*cap placements
    base = np.concatenate([
        rng.normal(0, 1e-3, (heavy, d)),
        rng.uniform(-4, 4, (n - heavy, d)),
    ]).astype(np.float32)
    assign = _balanced_assign(base, K, cap, iters=3, seed=0, n_choices=2)
    err = capfd.readouterr().err
    assert assign.min() >= 0 and assign.max() < K
    counts = np.bincount(assign, minlength=K)
    assert counts.max() <= cap
    # the overflow actually happened and was resolved by spilling, not by
    # the arbitrary-slot fallback
    assert "spill pass" in err
    assert "arbitrarily" not in err


def test_flags_dedup_matches_compare(setup):
    """Bitmap enqueue-dedup (the large-T serving mode) must walk the same
    frontier as the compare-based dedup wherever no cluster falls off the
    queue bottom and re-enters — at these shapes the outputs match
    entirely."""
    base, queries, graph, tidx, gt_ids = setup
    a = tile_search(tidx, queries, k=10, T=12, Lc=12, metric="ip",
                    batch_size=256)
    b = tile_search(tidx, queries, k=10, T=12, Lc=12, metric="ip",
                    batch_size=256, dedup_impl="flags")
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[2], b[2])  # cmps: same clusters scanned


def test_expand_batch_recall_and_invariants(setup):
    """Batched expansion (E clusters per queue sort) reads an iteration-
    stale frontier: not bit-pinned, but recall must hold, every cluster is
    expanded at most once (no duplicate result ids), and the full scan is
    exact."""
    base, queries, graph, tidx, gt_ids = setup
    ref = tile_search(tidx, queries, k=10, T=16, Lc=16, metric="ip",
                      batch_size=256)
    r_ref = recall(ref[0], gt_ids)
    for E in (4, 16):
        out = tile_search(tidx, queries, k=10, T=16, Lc=16, metric="ip",
                          batch_size=256, dedup_impl="flags",
                          expand_batch=E)
        assert recall(out[0], gt_ids) >= r_ref - 0.02, E
        for row in out[0]:
            live = row[row >= 0]
            assert len(set(live.tolist())) == live.size  # no dup results
    K = tidx.num_clusters
    full = tile_search(tidx, queries, k=10, T=K, Lc=K, metric="ip",
                       batch_size=256, dedup_impl="flags", expand_batch=8)
    assert recall(full[0], gt_ids) == 1.0


def test_expand_batch_requires_flags(setup):
    base, queries, _, tidx, _ = setup
    with pytest.raises(ValueError, match="flags"):
        tile_search(tidx, queries[:32], k=10, T=8, Lc=8, metric="ip",
                    batch_size=32, expand_batch=4)
