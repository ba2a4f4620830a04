"""Centroid seeding: recall-preserving start-candidate injection."""
import numpy as np
import jax.numpy as jnp
import pytest

import roargraph_tpu as rt
from roargraph_tpu.graph import PaddedGraph
from roargraph_tpu.ops.seeds import SeedIndex, build_seeds, seed_queries
from roargraph_tpu.ops.topk import knn
from roargraph_tpu import search as rsearch
from roargraph_tpu import eval as reval
from tests.conftest import make_crossmodal
from tests.test_search import _random_graph


def test_build_seeds_representatives(rng):
    base = rng.standard_normal((400, 8)).astype(np.float32)
    idx = build_seeds(base, n_centroids=16, iters=3, metric="l2")
    assert idx.seed_ids.ndim == 1 and idx.seed_ids.size <= 16
    assert (idx.seed_ids >= 0).all() and (idx.seed_ids < 400).all()
    np.testing.assert_allclose(idx.seed_vecs, base[idx.seed_ids])
    assert len(set(idx.seed_ids.tolist())) == idx.seed_ids.size


def test_seed_queries_picks_closest(rng):
    base = rng.standard_normal((200, 8)).astype(np.float32)
    sidx = build_seeds(base, n_centroids=8, iters=2, metric="ip")
    q = rng.standard_normal((5, 8)).astype(np.float32)
    ids, d = seed_queries(jnp.asarray(q), jnp.asarray(sidx.seed_ids),
                          jnp.asarray(sidx.seed_vecs), n_seeds=3,
                          metric=rt.Metric.IP)
    ids, d = np.asarray(ids), np.asarray(d)
    # brute check: the 3 best representatives per query
    scores = -(q @ sidx.seed_vecs.T)
    for b in range(5):
        expect = sidx.seed_ids[np.argsort(scores[b])[:3]]
        assert set(ids[b].tolist()) == set(expect.tolist())
        np.testing.assert_allclose(np.sort(d[b]), np.sort(scores[b])[:3],
                                   rtol=1e-5)


def test_seeded_search_preserves_recall(rng):
    base = rng.standard_normal((600, 16)).astype(np.float32)
    lists = _random_graph(rng, 600, 10)
    g = PaddedGraph.from_lists(lists, ep=0)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    gt, _ = knn(q, base, k=5, metric="ip")
    sidx = build_seeds(base, n_centroids=32, iters=3, metric="ip")

    plain_cfg = rt.SearchConfig(k=5, L_pq=24, metric="ip", batch_size=64)
    seed_cfg = rt.SearchConfig(k=5, L_pq=24, metric="ip", batch_size=64,
                               n_seeds=4)
    pids, _, _, phops = rsearch.search(g, base, q, plain_cfg)
    sids, _, scmps, shops = rsearch.search(g, base, q, seed_cfg, seeds=sidx)
    r_plain = reval.recall_at_k(pids, gt, 5)
    r_seed = reval.recall_at_k(sids, gt, 5)
    assert r_seed >= r_plain - 0.05, (r_seed, r_plain)
    # seeded results contain no duplicates
    for row in sids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
