import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu.bipartite import (BipartiteIndex, build_bipartite,
                                     search_bipartite)
from roargraph_tpu.graph import PAD
from roargraph_tpu.ops.topk import knn
from roargraph_tpu import eval as reval
from tests.conftest import make_crossmodal


@pytest.fixture(scope="module")
def bip():
    rng = np.random.default_rng(3)
    base, train_q = make_crossmodal(rng, n_base=800, n_query=600, dim=16)
    eval_q = make_crossmodal(rng, n_base=1, n_query=150, dim=16)[1]
    train_ids, _ = knn(train_q, base, k=20, metric="ip")
    index = build_bipartite(800, train_ids, M_pjbp=12, base_width=16)
    return base, train_ids, eval_q, index


def test_build_structure(bip):
    base, train_ids, _, index = bip
    # query node q's out-list = its NN list minus the head
    for q in (0, 5, 99):
        head = train_ids[q, 0]
        expect = [int(x) for x in train_ids[q, :12] if x != head]
        got = index.query_adj[q][index.query_adj[q] != PAD].tolist()
        assert got == expect
    # head nodes received reverse edges in query-id order
    heads = train_ids[:, 0].astype(np.int64)
    some_head = int(heads[0])
    expect_rev = np.flatnonzero(heads == some_head)[:16].tolist()
    got_rev = index.base_adj[some_head][
        index.base_adj[some_head] != PAD].tolist()
    assert got_rev == expect_rev


def test_reference_format_roundtrip(bip, tmp_path):
    base, _, _, index = bip
    p = str(tmp_path / "b.index")
    index.save_reference(p)
    loaded = BipartiteIndex.load_reference(p, nd=index.nd,
                                           base_width=index.base_adj.shape[1])
    np.testing.assert_array_equal(index.base_adj, loaded.base_adj)
    np.testing.assert_array_equal(index.query_adj, loaded.query_adj)


def test_two_hop_search_recall(bip):
    base, _, eval_q, index = bip
    gt_ids, _ = knn(eval_q, base, k=10, metric="ip")
    cfg = rt.SearchConfig(k=10, L_pq=60, metric="ip", batch_size=150)
    ids, dists, cmps, hops = search_bipartite(index, base, eval_q, cfg,
                                              seed=1)
    rec = reval.recall_at_k(ids, gt_ids, 10)
    assert rec > 0.6, rec
    assert (cmps > 0).all() and (hops > 0).all()
    # results sorted by score
    assert (np.diff(dists, axis=1) >= -1e-6).all()


def test_hot_head_in_degree_unbounded():
    """A head shared by >64 queries must keep every reverse edge by default
    (the reference's in-degree is unbounded, ``src/index_bipartite.cpp:264``);
    an explicit cap must report what it dropped instead of staying silent."""
    nsq, M = 100, 4
    train_ids = np.zeros((nsq, M), np.uint32)
    train_ids[:, 0] = 7            # every query's head is node 7
    train_ids[:, 1] = np.arange(nsq) % 5
    train_ids[:, 2] = 5 + np.arange(nsq) % 2
    train_ids[:, 3] = 9
    index = build_bipartite(10, train_ids, M_pjbp=M)
    row = index.base_adj[7]
    assert (row != PAD).sum() == nsq          # all 100 reverse edges kept
    assert row.tolist() == list(range(nsq))   # query-id order
    assert index.dropped_reverse_edges == 0

    capped = build_bipartite(10, train_ids, M_pjbp=M, base_width=64)
    assert (capped.base_adj[7] != PAD).sum() == 64
    assert capped.dropped_reverse_edges == nsq - 64


def test_search_deterministic_given_seed(bip):
    base, _, eval_q, index = bip
    cfg = rt.SearchConfig(k=5, L_pq=30, metric="ip", batch_size=150)
    a = search_bipartite(index, base, eval_q, cfg, seed=7)[0]
    b = search_bipartite(index, base, eval_q, cfg, seed=7)[0]
    np.testing.assert_array_equal(a, b)


def test_unbounded_width_refuses_oom_allocation():
    # one hot head over a huge base: the dense padded layout would need
    # n_base x max-in-degree int32 -- refuse with guidance, don't OOM
    import pytest as _pytest
    n_base = 300_000_000
    knn = np.tile(np.array([[5, 1, 2]], np.int64), (50, 1))
    with _pytest.raises(ValueError, match="base_width"):
        build_bipartite(n_base, knn, 3)
