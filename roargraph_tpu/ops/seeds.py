"""Entry-point seeding: start each query's walk near its own region.

The reference always enters at the global medoid
(``src/index_bipartite.cpp:2323``), so every search pays the hops from the
centroid region to the query's neighborhood. A cheap coarse quantizer fixes
that on TPU terms: k-means centroids scored against the whole query batch is
one MXU matmul, and each query seeds its queue with the data points
representing its closest centroids. Recall at a given L is unchanged or
better (seeding only adds start candidates); hop counts drop materially on
large/clustered corpora. Off by default for strict reference parity.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Metric
from .distance import pairwise_scores


@dataclasses.dataclass
class SeedIndex:
    seed_ids: np.ndarray    # [C] base ids, one representative per centroid
    seed_vecs: np.ndarray   # [C, D] the representatives' vectors

    def save_npz(self, path: str) -> None:
        np.savez_compressed(path, seed_ids=self.seed_ids,
                            seed_vecs=self.seed_vecs)

    @staticmethod
    def load_npz(path: str) -> "SeedIndex":
        with np.load(path) as z:
            return SeedIndex(z["seed_ids"], z["seed_vecs"])


@functools.partial(jax.jit, static_argnames=("n_centroids", "iters"))
def _kmeans(base, key, *, n_centroids, iters):
    """Lloyd's k-means (L2) on device; returns centroids [C, D]."""
    n = base.shape[0]
    idx = jax.random.choice(key, n, (n_centroids,), replace=False)
    centroids = base[idx]

    def step(centroids, _):
        d = pairwise_scores(base, centroids, Metric.L2,
                            precision=jax.lax.Precision.DEFAULT)  # [N, C]
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, n_centroids, dtype=base.dtype)
        sums = one_hot.T @ base
        counts = one_hot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


def build_seeds(base, *, n_centroids: int = 1024, iters: int = 5,
                metric: Metric | str = Metric.IP, seed: int = 0) -> SeedIndex:
    """Cluster the base set and pick one representative data point per
    centroid (the member closest to it in L2)."""
    base = np.asarray(base)
    n = base.shape[0]
    n_centroids = min(n_centroids, n)
    base_dev = jnp.asarray(base)
    cents = _kmeans(base_dev, jax.random.PRNGKey(seed),
                    n_centroids=n_centroids, iters=iters)
    # representative = argmin_{x in base} L2(x, centroid), batched over cents
    d = pairwise_scores(cents, base_dev, Metric.L2,
                        precision=jax.lax.Precision.DEFAULT)  # [C, N]
    reps = np.asarray(jnp.argmin(d, axis=1)).astype(np.int64)
    reps = np.unique(reps)
    return SeedIndex(seed_ids=reps.astype(np.int32), seed_vecs=base[reps])


@functools.partial(jax.jit, static_argnames=("n_seeds", "metric"))
def seed_queries(queries, seed_ids, seed_vecs, *, n_seeds: int,
                 metric: Metric):
    """Per query: the ids and scores of its ``n_seeds`` best representatives
    — one [B, C] contraction, MXU-friendly."""
    d = pairwise_scores(queries, seed_vecs, metric)          # [B, C]
    neg_top, pos = jax.lax.top_k(-d, n_seeds)
    ids = seed_ids[pos]
    return ids.astype(jnp.int32), -neg_top
