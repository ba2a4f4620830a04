import numpy as np
import jax.numpy as jnp
import pytest

from roargraph_tpu.config import Metric, SearchConfig
from roargraph_tpu.graph import PaddedGraph
from roargraph_tpu import search as rsearch
from tests import oracle


def _random_graph(rng, n, deg, extra_ep_links=True):
    """Connected-ish random digraph as adjacency lists."""
    lists = []
    for i in range(n):
        nbrs = rng.choice(np.setdiff1d(np.arange(n), [i]), deg, replace=False)
        lists.append(nbrs.astype(np.int32))
    # make node 0 reach everything eventually: chain links
    for i in range(n - 1):
        if i + 1 not in lists[i]:
            lists[i] = np.concatenate([lists[i], [i + 1]]).astype(np.int32)
    return lists


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("L", [4, 16])
def test_beam_search_matches_oracle(rng, metric, L):
    n, dim, deg = 120, 8, 5
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, deg)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((12, dim)).astype(np.float32)
    k = min(4, L)

    res = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(g.ep), k=k, L=L, metric=Metric.parse(metric),
        max_hops=10_000)
    ids = np.asarray(res.ids)
    dists = np.asarray(res.dists)
    cmps = np.asarray(res.cmps)
    hops = np.asarray(res.hops)

    for qi in range(queries.shape[0]):
        oids, odists, ocmps, ohops = oracle.beam_search(
            lists, base, queries[qi], 0, k, L, metric)
        assert ids[qi].tolist() == oids, f"query {qi}"
        np.testing.assert_allclose(dists[qi], odists, rtol=1e-4, atol=1e-5)
        assert cmps[qi] == ocmps
        assert hops[qi] == ohops


def test_beam_search_capture_retset(rng):
    n, dim, deg = 80, 6, 4
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, deg)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = base[rng.integers(0, n, 6)]  # search for existing nodes
    self_ids = np.array([-1] * 6, np.int32)

    res = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(g.ep), k=4, L=8, metric=Metric.L2, max_hops=10_000,
        capture=64)
    ret_ids = np.asarray(res.ret_ids)
    hops = np.asarray(res.hops)
    for qi in range(6):
        _, _, _, ohops, oret = oracle.beam_search(
            lists, base, queries[qi], 0, 4, 8, "l2", capture=True)
        got = [int(x) for x in ret_ids[qi] if x >= 0]
        assert got == [r[0] for r in oret][:64]
        assert hops[qi] == ohops


def test_beam_search_exclude_self(rng):
    n, dim = 60, 6
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 4)
    g = PaddedGraph.from_lists(lists, ep=0)
    node_ids = np.arange(6, dtype=np.int32) + 10
    queries = base[node_ids]

    res = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(g.ep), k=4, L=8, metric=Metric.L2, max_hops=10_000,
        exclude_self=True, self_ids=jnp.asarray(node_ids))
    ids = np.asarray(res.ids)
    for qi, node in enumerate(node_ids):
        oids, _, _, _ = oracle.beam_search(
            lists, base, queries[qi], 0, 4, 8, "l2", exclude=int(node))
        assert ids[qi].tolist() == oids
        # ep==0 is never excluded here, but the node itself must not appear
        # unless it was the entry point
        assert int(node) not in ids[qi][ids[qi] != 0].tolist() or node == 0


def test_search_host_wrapper_pads_batches(rng):
    n, dim = 100, 8
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 5)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((23, dim)).astype(np.float32)
    cfg = SearchConfig(k=3, L_pq=8, metric=Metric.IP, batch_size=10)
    ids, dists, cmps, hops = rsearch.search(g, base, queries, cfg)
    assert ids.shape == (23, 3)
    for qi in range(23):
        oids, _, _, _ = oracle.beam_search(lists, base, queries[qi], 0, 3, 8,
                                           "ip")
        assert ids[qi].tolist() == oids


@pytest.mark.parametrize("chunk", [8, 16])
def test_chunked_gather_path_matches_monolithic(rng, chunk):
    """The fresh-compaction chunked gather is a pure perf transform: results,
    cmps and hops must be identical to the monolithic path."""
    n, dim, deg = 150, 8, 40  # deg > chunk so the inner loop really runs
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, deg)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((9, dim)).astype(np.float32)
    kw = dict(k=5, L=16, metric=Metric.IP, max_hops=10_000)
    res_c = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), gather_chunk=chunk, **kw)
    res_m = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), gather_chunk=0, **kw)
    np.testing.assert_array_equal(np.asarray(res_c.ids), np.asarray(res_m.ids))
    np.testing.assert_array_equal(np.asarray(res_c.cmps), np.asarray(res_m.cmps))
    np.testing.assert_array_equal(np.asarray(res_c.hops), np.asarray(res_m.hops))
    for qi in range(9):
        oids, _, ocmps, ohops = oracle.beam_search(
            lists, base, queries[qi], 0, 5, 16, "ip")
        assert np.asarray(res_c.ids)[qi].tolist() == oids
        assert np.asarray(res_c.cmps)[qi] == ocmps


def test_expand_width_quality(rng):
    """Multi-expansion changes expansion order but must not produce
    duplicates and should retain recall at the same L."""
    from roargraph_tpu.ops.topk import knn
    n, dim = 400, 16
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 12)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((32, dim)).astype(np.float32)
    gt_ids, _ = knn(queries, base, k=5, metric="ip")

    recalls = {}
    for E in (1, 4):
        res = rsearch.beam_search_batch(
            jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
            jnp.int32(0), k=5, L=32, metric=Metric.IP, max_hops=10_000,
            expand_width=E)
        ids = np.asarray(res.ids)
        d = np.asarray(res.dists)
        for row in ids:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real)
        assert (np.diff(d, axis=1) >= -1e-6).all()
        recalls[E] = np.mean([
            len(set(ids[i].tolist()) & set(gt_ids[i].tolist())) / 5
            for i in range(32)])
    assert recalls[4] >= recalls[1] - 0.05, recalls


def test_expand_width_capture(rng):
    """Capture with expand_width>1 (used by the fast build mode) records the
    multi-expansion frontier sequence: valid ids only, no duplicates, and a
    superset-scale expansion count vs strict best-first."""
    n, dim = 300, 12
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 10)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    R = 64
    res1 = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), k=5, L=16, metric=Metric.IP, max_hops=10_000,
        capture=R, expand_width=1)
    res4 = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), k=5, L=16, metric=Metric.IP, max_hops=10_000,
        capture=R, expand_width=4)
    for res in (res1, res4):
        ri = np.asarray(res.ret_ids)
        hops = np.asarray(res.hops)
        for q in range(16):
            row = ri[q]
            filled = row[row >= 0]
            # captured ids are real nodes, never padding/sentinels
            assert (filled < n).all()
            # the first min(hops, R) slots are contiguous and duplicate-free
            k_real = min(int(hops[q]), R)
            assert (row[:k_real] >= 0).all()
            assert len(set(row[:k_real].tolist())) == k_real
    # E=1 parity is oracle-pinned elsewhere. Expansion totals under E=4 can
    # differ either way (different exploration order changes which entries
    # ever enter the queue); only sanity-check the scale.
    h1, h4 = np.asarray(res1.hops), np.asarray(res4.hops)
    assert h4.mean() > 0.5 * h1.mean()


def test_dedup_mode_matches_bitmask(rng):
    """The visited-free search mode (duplicates collapsed in the queue merge)
    must reproduce the bitmask engine's queue evolution exactly: same ids,
    dists, hops, and expansion-order capture. Only cmps may grow (re-scores
    are counted). This is what licenses phase B to drop the O(B*N/32)
    visited state."""
    n, dim = 400, 12
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 6)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((64, dim)).astype(np.float32)
    adj, bb, qq = jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries)
    for L, chunk in ((16, 32), (40, 0)):
        a = rsearch.beam_search_batch(
            adj, bb, qq, jnp.int32(0), k=5, L=L, metric=Metric.IP,
            max_hops=10_000, capture=L, exclude_self=True,
            self_ids=jnp.arange(64, dtype=jnp.int32), gather_chunk=chunk)
        b = rsearch.beam_search_batch(
            adj, bb, qq, jnp.int32(0), k=5, L=L, metric=Metric.IP,
            max_hops=10_000, capture=L, exclude_self=True,
            self_ids=jnp.arange(64, dtype=jnp.int32), gather_chunk=chunk,
            visited_mode="dedup")
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        np.testing.assert_allclose(np.asarray(a.dists), np.asarray(b.dists))
        np.testing.assert_array_equal(np.asarray(a.hops), np.asarray(b.hops))
        np.testing.assert_array_equal(np.asarray(a.ret_ids),
                                      np.asarray(b.ret_ids))
        assert (np.asarray(b.cmps) >= np.asarray(a.cmps)).all()


def test_search_config_dedup_mode(rng):
    """SearchConfig(visited_mode="dedup") plumbs through both host wrappers:
    plain and segmented dedup searches match the bitmask engine's ids, dists
    and hops exactly (the serving-path knob for N >= ~1M, where the visited
    bitmask gather/scatter dominates the hop)."""
    n, dim = 300, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 7)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((150, dim)).astype(np.float32)
    ref = rsearch.search(
        g, base, queries,
        SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128))
    for segmented in (False, True):
        got = rsearch.search(
            g, base, queries,
            SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128,
                         visited_mode="dedup", segmented=segmented,
                         segment_hops=8 if segmented else None))
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_allclose(ref[1], got[1], rtol=1e-6)
        np.testing.assert_array_equal(ref[3], got[3])  # hops exact
    with pytest.raises(ValueError):
        SearchConfig(k=5, L_pq=24, visited_mode="nope")


def test_segmented_matches_plain(rng):
    """Segmented serving engine must return bit-identical results, cmps and
    hops — segmentation and compaction are pure scheduling transforms."""
    n, dim = 300, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 7)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((150, dim)).astype(np.float32)
    plain = SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128)
    seg = SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128,
                       segmented=True, segment_hops=8)
    p = rsearch.search(g, base, queries, plain)
    s = rsearch.search(g, base, queries, seg)
    np.testing.assert_array_equal(p[0], s[0])          # ids exact
    np.testing.assert_allclose(p[1], s[1], rtol=1e-6)  # dists: XLA fusion
    np.testing.assert_array_equal(p[2], s[2])          # cmps exact
    np.testing.assert_array_equal(p[3], s[3])          # hops exact


def test_segmented_with_seeds_and_min_results(rng):
    """Seeded starts and check_min_results work in the segmented engine and
    match the plain engine bit-for-bit (large-N serving wants seeded AND
    segmented together)."""
    from roargraph_tpu.ops.seeds import build_seeds

    n, dim = 300, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 7)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((150, dim)).astype(np.float32)
    sidx = build_seeds(base, n_centroids=16, iters=2, metric="ip")
    plain = SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128,
                         n_seeds=4, check_min_results=True)
    seg = SearchConfig(k=5, L_pq=24, metric=Metric.IP, batch_size=128,
                       n_seeds=4, check_min_results=True,
                       segmented=True, segment_hops=8)
    p = rsearch.search(g, base, queries, plain, seeds=sidx)
    s = rsearch.search(g, base, queries, seg, seeds=sidx)
    np.testing.assert_array_equal(p[0], s[0])
    np.testing.assert_allclose(p[1], s[1], rtol=1e-6)
    np.testing.assert_array_equal(p[2], s[2])
    np.testing.assert_array_equal(p[3], s[3])


def test_segmented_check_min_results_raises(rng):
    """A graph too disconnected to fill k results must raise the reference's
    error (``check_min_results``) from the segmented engine too."""
    base = rng.standard_normal((40, 8)).astype(np.float32)
    # ep-only island: every node's list is empty except ep -> one neighbor
    lists = [[] for _ in range(40)]
    lists[0] = [1]
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((8, 8)).astype(np.float32)
    cfg = SearchConfig(k=5, L_pq=8, metric=Metric.IP, batch_size=8,
                       check_min_results=True, segmented=True,
                       segment_hops=4)
    with pytest.raises(RuntimeError, match="not enough results"):
        rsearch.search(g, base, queries, cfg)


def test_dynamic_L_matches_static(rng):
    """A bucketed (padded-width) queue with runtime capacity must behave
    exactly like the statically-sized queue: same ids, cmps, hops."""
    n, dim = 250, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 6)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((40, dim)).astype(np.float32)
    for L in (5, 17, 30):
        stat = SearchConfig(k=5, L_pq=L, metric=Metric.IP, batch_size=40)
        dyn = SearchConfig(k=5, L_pq=L, metric=Metric.IP, batch_size=40,
                           L_bucket=32)
        a = rsearch.search(g, base, queries, stat)
        b = rsearch.search(g, base, queries, dyn)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_allclose(a[1], b[1], rtol=1e-6)
        np.testing.assert_array_equal(a[2], b[2])
        np.testing.assert_array_equal(a[3], b[3])


def test_L_bucket_validation():
    with pytest.raises(ValueError, match="L_bucket"):
        SearchConfig(k=5, L_pq=64, L_bucket=32)


@pytest.mark.parametrize("chunk", [0, 8])
def test_sparse_visited_matches_dense(rng, chunk):
    """Small graphs auto-select the dense visited mode; the sparse
    (gather/scatter bitmask) path used at large N must agree exactly."""
    n, dim = 220, 8
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 9)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    kw = dict(k=5, L=16, metric=Metric.IP, max_hops=10_000,
              gather_chunk=chunk)
    dense = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), visited_dense=True, **kw)
    sparse = rsearch.beam_search_batch(
        jnp.asarray(g.ids), jnp.asarray(base), jnp.asarray(queries),
        jnp.int32(0), visited_dense=False, **kw)
    np.testing.assert_array_equal(np.asarray(dense.ids),
                                  np.asarray(sparse.ids))
    np.testing.assert_array_equal(np.asarray(dense.cmps),
                                  np.asarray(sparse.cmps))
    np.testing.assert_array_equal(np.asarray(dense.hops),
                                  np.asarray(sparse.hops))
    # oracle anchor
    for qi in range(4):
        oids, _, ocmps, _ = oracle.beam_search(
            lists, base, queries[qi], 0, 5, 16, "ip")
        assert np.asarray(sparse.ids)[qi].tolist() == oids
        assert np.asarray(sparse.cmps)[qi] == ocmps


def test_pack_unpack_roundtrip():
    """pack_results bitcasts dists into the single fetched buffer; the host
    inverse must recover ids/dists/cmps/hops exactly, inf and -0.0
    included."""
    ids = np.array([[3, -1, 7], [0, 2, 2**31 - 1]], np.int32)
    dists = np.array([[1.5, np.inf, -2.25], [-0.0, 3e38, 1e-38]], np.float32)
    cmps = np.array([11, 22], np.int32)
    hops = np.array([2, 5], np.int32)
    packed = np.asarray(rsearch.pack_results(
        jnp.asarray(ids), jnp.asarray(dists), jnp.asarray(cmps),
        jnp.asarray(hops)))
    assert packed.shape == (2, 8) and packed.dtype == np.int32
    bi, bd, bc, bh = rsearch.unpack_results(packed, 3)
    np.testing.assert_array_equal(bi, ids)
    np.testing.assert_array_equal(bd.view(np.int32), dists.view(np.int32))
    np.testing.assert_array_equal(bc, cmps)
    np.testing.assert_array_equal(bh, hops)


def test_bf16_base_search_recall(rng):
    """bf16 base vectors (half the gather bytes/HBM) must preserve search
    quality: same graph, near-identical recall; ids mostly agree with f32."""
    n, dim = 400, 24
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 7)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((100, dim)).astype(np.float32)
    cfg = SearchConfig(k=10, L_pq=40, metric=Metric.IP, batch_size=128)
    f32 = rsearch.search(g, base, queries, cfg)
    b16 = rsearch.search(g, jnp.asarray(base).astype(jnp.bfloat16),
                         queries, cfg)
    overlap = np.mean([len(set(f32[0][i]) & set(b16[0][i])) / 10
                       for i in range(100)])
    assert overlap > 0.9, overlap
