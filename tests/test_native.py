"""C++ CPU runtime vs the numpy oracle and the JAX engine."""
import numpy as np
import pytest

import roargraph_tpu as rt
from roargraph_tpu import native
from roargraph_tpu.graph import PaddedGraph
from roargraph_tpu import search as rsearch
from tests import oracle
from tests.test_search import _random_graph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_native_matches_oracle(rng):
    n, dim = 150, 10
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 5)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((10, dim)).astype(np.float32)
    cfg = rt.SearchConfig(k=4, L_pq=12, metric="ip")
    ids, dists, cmps, hops = native.search_native(g, base, queries, cfg,
                                                  num_threads=2)
    for qi in range(10):
        oids, odists, ocmps, ohops = oracle.beam_search(
            lists, base, queries[qi], 0, 4, 12, "ip")
        assert ids[qi].tolist() == oids, qi
        np.testing.assert_allclose(dists[qi], odists, rtol=1e-5, atol=1e-6)
        assert cmps[qi] == ocmps and hops[qi] == ohops


def test_native_matches_jax_engine(rng):
    n, dim = 200, 12
    base = rng.standard_normal((n, dim)).astype(np.float32)
    lists = _random_graph(rng, n, 6)
    g = PaddedGraph.from_lists(lists, ep=0)
    queries = rng.standard_normal((30, dim)).astype(np.float32)
    cfg = rt.SearchConfig(k=5, L_pq=20, metric="l2", batch_size=30)
    jids, jd, jc, jh = rsearch.search(g, base, queries, cfg)
    nids, nd, nc, nh = native.search_native(g, base, queries, cfg)
    np.testing.assert_array_equal(jids, nids)
    np.testing.assert_array_equal(jc, nc)
    np.testing.assert_array_equal(jh, nh)


def test_native_brute_knn(rng):
    base = rng.standard_normal((300, 8)).astype(np.float32)
    q = rng.standard_normal((20, 8)).astype(np.float32)
    ids, d = native.brute_knn_native(base, q, 7, "ip")
    oid, od = oracle.brute_knn(q, base, 7, "ip")
    np.testing.assert_array_equal(ids.astype(np.int64), oid)
    np.testing.assert_allclose(d, od, rtol=1e-5, atol=1e-5)
