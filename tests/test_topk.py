import numpy as np
import pytest

from roargraph_tpu.ops import topk
from tests import oracle


@pytest.mark.parametrize("metric", ["ip", "l2"])
def test_knn_matches_oracle(rng, metric):
    base = rng.standard_normal((1000, 24)).astype(np.float32)
    queries = rng.standard_normal((50, 24)).astype(np.float32)
    ids, d = topk.knn(queries, base, k=10, metric=metric, tile=128,
                      query_batch=16)
    oid, od = oracle.brute_knn(queries, base, 10, metric)
    # allow index permutation on near-ties only
    assert (ids.astype(np.int64) == oid).mean() > 0.999
    np.testing.assert_allclose(d, od, rtol=1e-4, atol=1e-4)


def test_knn_small_n_not_multiple_of_tile(rng):
    base = rng.standard_normal((77, 8)).astype(np.float32)
    queries = rng.standard_normal((5, 8)).astype(np.float32)
    ids, d = topk.knn(queries, base, k=5, metric="ip", tile=32)
    oid, od = oracle.brute_knn(queries, base, 5, "ip")
    np.testing.assert_array_equal(ids.astype(np.int64), oid)
    np.testing.assert_allclose(d, od, rtol=1e-5, atol=1e-5)


def test_knn_cosine_on_normalized(rng):
    base = rng.standard_normal((300, 12)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    q = rng.standard_normal((9, 12)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ids, d = topk.knn(q, base, k=4, metric="cosine", tile=64)
    oid, od = oracle.brute_knn(q, base, 4, "ip")
    np.testing.assert_array_equal(ids.astype(np.int64), oid)
    assert (d >= -1.0001).all() and (d <= 1.0001).all()


def test_knn_k_larger_than_tile(rng):
    base = rng.standard_normal((256, 6)).astype(np.float32)
    q = rng.standard_normal((3, 6)).astype(np.float32)
    ids, d = topk.knn(q, base, k=40, metric="l2", tile=32)
    oid, od = oracle.brute_knn(q, base, 40, "l2")
    assert (ids.astype(np.int64) == oid).mean() > 0.99
    np.testing.assert_allclose(d, od, rtol=1e-4, atol=1e-4)


def test_knn_approx_mode(rng):
    """approx=True pre-selects per-tile candidates with approx_min_k; on any
    backend the returned scores must be genuine (match the oracle for the
    ids returned) and overlap the exact top-k heavily."""
    base = rng.standard_normal((2048, 16)).astype(np.float32)
    q = rng.standard_normal((32, 16)).astype(np.float32)
    ids, d = topk.knn(q, base, k=10, metric="ip", tile=256, approx=True)
    oid, od = oracle.brute_knn(q, base, 10, "ip")
    overlap = np.mean([len(set(ids[i].tolist()) & set(oid[i].tolist())) / 10
                       for i in range(q.shape[0])])
    assert overlap >= 0.9
    # scores are exact for whatever ids were returned
    exact = -(q @ base.T)
    np.testing.assert_allclose(
        d, np.take_along_axis(exact, ids.astype(np.int64), axis=1),
        rtol=1e-4, atol=1e-5)


def test_knn_block_approx_mode(rng):
    """approx="block" pre-selects one candidate per 64-score block with a
    VPU min-reduce (5.4x the approx_min_k rate on TPU at the 10M shard-GT
    shape, scripts/probe_gt_select.py). Loss happens only when two true
    top-k members share a block of one tile; at build-GT densities that is
    tail noise. Scores must stay genuine; odd tile sizes must still work
    (block width shrinks to divide the tile)."""
    base = rng.standard_normal((4096, 16)).astype(np.float32)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    oid, _ = oracle.brute_knn(q, base, 10, "ip")
    exact = -(q @ base.T)
    for tile in (1024, 768):  # 768 % 64 != 0: divisor fallback path
        ids, d = topk.knn(q, base, k=10, metric="ip", tile=tile,
                          approx="block")
        overlap = np.mean([len(set(ids[i].tolist()) & set(oid[i].tolist()))
                           / 10 for i in range(q.shape[0])])
        assert overlap >= 0.85, (tile, overlap)
        np.testing.assert_allclose(
            d, np.take_along_axis(exact, ids.astype(np.int64), axis=1),
            rtol=1e-4, atol=1e-5)
