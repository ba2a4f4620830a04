import numpy as np
import jax.numpy as jnp
import pytest

from roargraph_tpu.config import Metric
from roargraph_tpu.ops import prune
from tests import oracle


def _setup(rng, n=200, dim=12, B=16, C=20, metric="ip"):
    base = rng.standard_normal((n, dim)).astype(np.float32)
    nodes = rng.integers(0, n, B).astype(np.int32)
    cand = np.empty((B, C), np.int32)
    for b in range(B):
        # unique candidates, excluding the node itself
        pool = np.setdiff1d(np.arange(n), [nodes[b]])
        cand[b] = rng.choice(pool, C, replace=False)
    dists = np.empty((B, C), np.float32)
    for b in range(B):
        for c in range(C):
            dists[b, c] = oracle.score(base[cand[b, c]], base[nodes[b]],
                                       metric)
    valid = np.ones((B, C), bool)
    # knock out a few slots to exercise padding
    valid[:, -2:] = rng.random((B, 2)) > 0.5
    return base, nodes, cand, dists, valid


@pytest.mark.parametrize("metric", ["ip", "l2"])
@pytest.mark.parametrize("backfill", [False, True])
def test_prune_matches_oracle(rng, metric, backfill):
    base, nodes, cand, dists, valid = _setup(rng, metric=metric)
    M = 6
    out, _ = prune.occlusion_prune(
        jnp.asarray(cand), jnp.asarray(dists), jnp.asarray(valid),
        jnp.asarray(base[nodes]), jnp.asarray(base),
        metric=Metric.parse(metric), M=M, backfill=backfill)
    out = np.asarray(out)

    for b in range(nodes.shape[0]):
        ids = [int(i) for i, v in zip(cand[b], valid[b]) if v]
        ds = [float(d) for d, v in zip(dists[b], valid[b]) if v]
        expect = oracle.occlusion_prune(
            ids, ds,
            lambda i, j: oracle.score(base[i], base[j], metric),
            M, backfill=backfill)
        got = [int(x) for x in out[b] if x >= 0]
        assert got == expect, f"row {b}: {got} != {expect}"


def test_prune_defer_first_element(rng):
    metric = "ip"
    base, nodes, cand, dists, valid = _setup(rng, metric=metric, B=8, C=15)
    M = 5
    defer = np.zeros_like(valid)
    defer[:, :] = rng.random(valid.shape) < 0.4

    out, _ = prune.occlusion_prune(
        jnp.asarray(cand), jnp.asarray(dists), jnp.asarray(valid),
        jnp.asarray(base[nodes]), jnp.asarray(base),
        metric=Metric.IP, M=M, backfill=False,
        defer_mask=jnp.asarray(defer), use_defer=True)
    out = np.asarray(out)

    for b in range(nodes.shape[0]):
        ids, ds, dset = [], [], set()
        for i in range(cand.shape[1]):
            if valid[b, i]:
                ids.append(int(cand[b, i]))
                ds.append(float(dists[b, i]))
                if defer[b, i]:
                    dset.add(int(cand[b, i]))
        expect = oracle.occlusion_prune(
            ids, ds,
            lambda i, j: oracle.score(base[i], base[j], metric),
            M, defer=dset)
        got = [int(x) for x in out[b] if x >= 0]
        assert got == expect, f"row {b}: {got} != {expect}"
        if got:
            assert got[0] not in dset


def test_prune_degree_bound_and_backfill_fill(rng):
    base, nodes, cand, dists, valid = _setup(rng, B=4, C=30)
    M = 10
    out, _ = prune.occlusion_prune(
        jnp.asarray(cand), jnp.asarray(dists), jnp.asarray(valid),
        jnp.asarray(base[nodes]), jnp.asarray(base),
        metric=Metric.IP, M=M, backfill=True)
    out = np.asarray(out)
    for b in range(4):
        got = [int(x) for x in out[b] if x >= 0]
        n_valid = int(valid[b].sum())
        assert len(got) == min(M, n_valid)  # backfill tops up to exactly M
        assert len(set(got)) == len(got)
