"""Legacy/alternate build paths (roargraph_tpu.alt): semantic parity tests.

The reference paths these port are driver-unreachable dead code
(``src/index_bipartite.cpp:358-634,892-949``; SURVEY.md §2.1), so there is
no behavioral oracle to diff against — the tests assert the documented
invariants: degree bounds, reachability-prune semantics, graph quality
(searchable with decent recall), and local-join occlusion behavior.
"""
import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu import alt
from roargraph_tpu.bipartite import search_bipartite
from roargraph_tpu.graph import PAD
from roargraph_tpu.ops.topk import knn

from conftest import make_crossmodal


@pytest.fixture(scope="module")
def data(rng):
    base, queries = make_crossmodal(rng, n_base=800, n_query=120, dim=16)
    train_q = make_crossmodal(rng, n_base=1, n_query=400, dim=16)[1]
    return base, train_q, queries


def test_reachability_prune_semantics():
    """Keep iff not reachable within two hops of the kept set; backfill."""
    # adjacency: 0 -> 1 -> 2 (so keeping 0 flags 2 via nbrs-of-nbrs);
    # node 1 is flagged only as a *candidate* after being kept itself.
    adj = np.full((6, 2), PAD, np.int32)
    adj[0, 0] = 1
    adj[1, 0] = 2
    pool = np.array([[0, 2, 3, 4]], np.int32)    # ranked by dist below
    dists = np.array([[0.1, 0.2, 0.3, 0.4]], np.float32)
    valid = np.ones((1, 4), bool)
    kept = np.asarray(alt.reachability_prune(pool, dists, valid, adj, 3))
    # 0 kept; 2 occluded (reachable via 0->1->2); 3 kept; 4 kept
    assert kept[0].tolist() == [0, 3, 4]
    # bound 4 -> backfill brings the occluded 2 back in pool order
    kept = np.asarray(alt.reachability_prune(pool, dists, valid, adj, 4))
    assert kept[0].tolist() == [0, 3, 4, 2]


def test_incremental_build_invariants(data):
    base, train_q, _ = data
    M_bp, M_sq = 8, 12
    idx = alt.incremental_bipartite_build(
        base, train_q, M_bp=M_bp, M_sq=M_sq, L_pq=32, metric="ip",
        wave=128, seed=3)
    nd, nsq = base.shape[0], train_q.shape[0]
    assert idx.base_adj.shape[0] == nd and idx.query_adj.shape[0] == nsq
    # edges point across sides and respect padding
    bvalid = idx.base_adj != PAD
    qvalid = idx.query_adj != PAD
    assert (idx.base_adj[bvalid] >= 0).all()
    assert (idx.base_adj[bvalid] < nsq).all()
    assert (idx.query_adj[qvalid] >= 0).all()
    assert (idx.query_adj[qvalid] < nd).all()
    # almost every node linked (the relink pass exists for stragglers)
    assert (bvalid.any(axis=1)).mean() > 0.95
    assert (qvalid.any(axis=1)).mean() > 0.95


def test_incremental_build_searchable(data):
    """The incrementally built graph serves the two-hop search with usable
    recall — the point of the legacy path."""
    base, train_q, queries = data
    idx = alt.incremental_bipartite_build(
        base, train_q, M_bp=8, M_sq=12, L_pq=32, metric="ip",
        wave=128, seed=3)
    gt_ids, _ = knn(queries, base, k=10, metric="ip")
    cfg = rt.SearchConfig(k=10, L_pq=64, metric="ip", batch_size=128,
                          max_hops=128)
    ids, _, _, _ = search_bipartite(idx, base, queries, cfg)
    rec = np.mean([len(set(ids[i].tolist()) &
                       set(np.asarray(gt_ids)[i].tolist())) / 10
                   for i in range(queries.shape[0])])
    assert rec > 0.6, rec


def test_incremental_build_deterministic(data):
    base, train_q, _ = data
    a = alt.incremental_bipartite_build(
        base[:300], train_q[:150], M_bp=6, M_sq=8, L_pq=24, metric="ip",
        wave=64, seed=11)
    b = alt.incremental_bipartite_build(
        base[:300], train_q[:150], M_bp=6, M_sq=8, L_pq=24, metric="ip",
        wave=64, seed=11)
    np.testing.assert_array_equal(a.base_adj, b.base_adj)
    np.testing.assert_array_equal(a.query_adj, b.query_adj)


def test_local_join_prune(data):
    base, _, _ = data
    # a small projection graph to join into
    train_ids, _ = knn(base[:100], base, k=16, metric="ip")
    g = np.asarray(train_ids)[:, 1:9].astype(np.int32)  # [100, 8] rows
    graph = np.full((base.shape[0], 8), PAD, np.int32)
    graph[:100] = g
    nodes = np.arange(20, dtype=np.int32)
    cands = np.arange(200, 220, dtype=np.int32)
    out = np.asarray(alt.local_join_prune(nodes, cands, graph, base, M=8,
                                          metric="ip"))
    assert out.shape == (20, 8)
    # no self edges, no PAD leakage into the kept prefix
    for r, n in zip(out, nodes):
        kept = r[r != PAD]
        assert n not in kept
        assert len(set(kept.tolist())) == kept.size
    # inserting a candidate already present must not duplicate it
    out2 = np.asarray(alt.local_join_prune(
        nodes, graph[nodes, 0], graph, base, M=8, metric="ip"))
    for r in out2:
        kept = r[r != PAD]
        assert len(set(kept.tolist())) == kept.size
