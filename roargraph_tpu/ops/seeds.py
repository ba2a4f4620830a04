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
import sys
import time

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


def _assign_chunk(n: int, n_centroids: int) -> int:
    """Chunk so the [chunk, C] score block stays ~256 MB (the full [N, C]
    block is 62 GB at N=1M, C=15k — far past HBM)."""
    c = max(1024, (1 << 26) // max(n_centroids, 1))
    return min(c, max(n, 1))


def _chunk_schedule(n: int, chunk: int):
    """Offsets + first-fresh-row thresholds covering [0, n) with in-place
    slices (no padded copy of the base array — that copy is 5 GB at the
    2.5M/512-d scale and was the OOM at exactly the N this chunking exists
    for). The final slice starts at n-chunk and overlaps the previous one;
    rows below its threshold are already-processed and get masked out."""
    G = -(-n // chunk)
    offs = [min(i * chunk, n - chunk) for i in range(G)]
    thresh = [i * chunk for i in range(G)]
    return (jnp.asarray(offs, jnp.int32), jnp.asarray(thresh, jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_centroids", "chunk"))
def _kmeans_iter(base, centroids, *, n_centroids, chunk):
    """One Lloyd iteration (L2) on device; returns updated centroids.

    Assignment is chunked over base rows via in-place dynamic slices: each
    chunk scores [chunk, C] on the MXU, then scatter-adds its members into
    per-centroid sums accumulated in a scan carry — peak memory stays
    O(chunk * C + C * D) regardless of N, with no full-size temporary."""
    n, d_dim = base.shape
    offs, thresh = _chunk_schedule(n, chunk)

    def one(carry, args):
        sums, counts = carry
        off, th = args
        xc = jax.lax.dynamic_slice_in_dim(base, off, chunk)
        fresh = (off + jnp.arange(chunk, dtype=jnp.int32)) >= th
        d = pairwise_scores(xc, centroids, Metric.L2,
                            precision=jax.lax.Precision.DEFAULT)
        a = jnp.argmin(d, axis=1)
        a = jnp.where(fresh, a, n_centroids)  # overlap rows scatter-drop
        sums = sums.at[a].add(xc, mode="drop")
        counts = counts.at[a].add(1.0, mode="drop")
        return (sums, counts), None

    init = (jnp.zeros((n_centroids, d_dim), base.dtype),
            jnp.zeros((n_centroids,), base.dtype))
    (sums, counts), _ = jax.lax.scan(one, init, (offs, thresh))
    counts = counts[:, None]
    return jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)


def _kmeans(base, key, *, n_centroids, iters, chunk):
    """Lloyd's k-means (L2); returns centroids [C, D].

    The iteration loop runs on the host — one device program per Lloyd
    iteration — so (a) no single program approaches the tunnel's long-running
    -program failure modes at 10M-scale shapes, and (b) slow iterations emit
    progress (watchdogged drivers key liveness off output cadence)."""
    idx = jax.random.choice(key, base.shape[0], (n_centroids,), replace=False)
    centroids = base[idx]
    for i in range(iters):
        t0 = time.time()
        centroids = _kmeans_iter(base, centroids, n_centroids=n_centroids,
                                 chunk=chunk)
        # scalar fetch = real sync (block_until_ready is unreliable through
        # the device relay) — keeps dispatch from running ahead of execution
        float(centroids[0, 0])
        dt = time.time() - t0
        if dt > 5.0:  # silent for tests/small shapes
            print(f"kmeans iter {i + 1}/{iters}: {dt:.0f}s",
                  file=sys.stderr, flush=True)
    return centroids


@functools.partial(jax.jit, static_argnames=("chunk",))
def _nearest_member(base, cents, *, chunk):
    """argmin_{x in base} L2(x, c) per centroid, chunked over base rows."""
    n, d_dim = base.shape
    C = cents.shape[0]
    offs, thresh = _chunk_schedule(n, chunk)

    def one(carry, args):
        bd, bi = carry
        off, th = args
        xc = jax.lax.dynamic_slice_in_dim(base, off, chunk)
        fresh = (off + jnp.arange(chunk, dtype=jnp.int32)) >= th
        d = pairwise_scores(cents, xc, Metric.L2,
                            precision=jax.lax.Precision.DEFAULT)  # [C, chunk]
        d = jnp.where(fresh[None, :], d, jnp.inf)
        m = jnp.argmin(d, axis=1)
        md = jnp.take_along_axis(d, m[:, None], axis=1)[:, 0]
        upd = md < bd
        return (jnp.where(upd, md, bd),
                jnp.where(upd, off + m.astype(jnp.int32), bi)), None

    init = (jnp.full((C,), jnp.inf, jnp.float32), jnp.zeros((C,), jnp.int32))
    (bd, bi), _ = jax.lax.scan(one, init, (offs, thresh))
    return bi


def build_seeds(base, *, n_centroids: int = 1024, iters: int = 5,
                metric: Metric | str = Metric.IP, seed: int = 0,
                train_subsample: int = 2_000_000) -> SeedIndex:
    """Cluster the base set and pick one representative data point per
    centroid (the member closest to it in L2).

    ``base`` may be a numpy array or an already-device-resident jax array —
    the latter avoids a second multi-GB HBM copy at large N. Centroids are
    trained on at most ``train_subsample`` rows (Lloyd's converges on a
    uniform subsample; the representative pass still scans every row)."""
    n = base.shape[0]
    n_centroids = min(n_centroids, n)
    base_dev = base if isinstance(base, jax.Array) else jnp.asarray(base)
    if n > train_subsample:
        stride = -(-n // train_subsample)
        train = base_dev[::stride]
    else:
        train = base_dev
    cents = _kmeans(train, jax.random.PRNGKey(seed),
                    n_centroids=n_centroids, iters=iters,
                    chunk=_assign_chunk(train.shape[0], n_centroids))
    # representative = argmin_{x in base} L2(x, centroid), chunked over base
    reps = np.asarray(_nearest_member(base_dev, cents,
                                      chunk=_assign_chunk(n, n_centroids)))
    reps = np.unique(reps.astype(np.int64))
    seed_vecs = np.asarray(base_dev[reps])  # fetch only the C chosen rows
    return SeedIndex(seed_ids=reps.astype(np.int32), seed_vecs=seed_vecs)


@functools.partial(jax.jit, static_argnames=("n_seeds", "metric"))
def seed_queries(queries, seed_ids, seed_vecs, *, n_seeds: int,
                 metric: Metric):
    """Per query: the ids and scores of its ``n_seeds`` best representatives
    — one [B, C] contraction, MXU-friendly."""
    d = pairwise_scores(queries, seed_vecs, metric)          # [B, C]
    neg_top, pos = jax.lax.top_k(-d, n_seeds)
    ids = seed_ids[pos]
    return ids.astype(jnp.int32), -neg_top
