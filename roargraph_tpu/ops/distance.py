"""Batched distance kernels for the MXU.

The reference computes distances one vector-pair at a time with AVX-512
intrinsics (``include/efanna2e/distance.h:39-223``). On TPU the same work is
expressed as dense batched contractions so XLA tiles it onto the 128x128
systolic array; there is deliberately **no** scalar-pair path.

Score convention (parity with the reference — smaller is always better):

- ``L2``     -> squared euclidean distance (``distance.h:39-89``)
- ``IP``     -> negated dot product (``distance.h:223`` returns ``-1.0 * dot``)
- ``COSINE`` -> negated dot of pre-normalized vectors
  (``src/index.cpp:16-19`` maps COSINE to the IP kernel after normalization)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Metric

Precision = jax.lax.Precision


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Row-normalize (parity with ``util.h:214-223``: plain divide by L2 norm)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm


def pairwise_scores(
    queries: jnp.ndarray,  # [Q, D]
    base: jnp.ndarray,     # [N, D]
    metric: Metric,
    *,
    precision=Precision.HIGHEST,
) -> jnp.ndarray:
    """All-pairs scores ``[Q, N]`` (smaller = closer). Inputs for COSINE must
    already be normalized (normalization is a dataset-load concern, matching
    the reference which normalizes at load time)."""
    dots = jax.lax.dot_general(
        queries, base,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    if metric is Metric.L2:
        qn = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        bn = jnp.sum(base.astype(jnp.float32) ** 2, axis=1)
        return qn + bn[None, :] - 2.0 * dots
    return -dots


def batched_scores(
    queries: jnp.ndarray,  # [B, D]
    vecs: jnp.ndarray,     # [B, M, D]  (per-query gathered neighbor vectors)
    metric: Metric,
    *,
    precision=Precision.DEFAULT,
) -> jnp.ndarray:
    """Per-query scores against per-query neighbor sets: ``[B, M]``.

    This is the search hot path's distance op (replaces the per-neighbor
    ``Distance::compare`` calls in ``src/index_bipartite.cpp:2387``)."""
    dots = jax.lax.dot_general(
        vecs, queries,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=precision,
        preferred_element_type=jnp.float32,
    )  # [B, M]
    if metric is Metric.L2:
        qn = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        vn = jnp.sum(vecs.astype(jnp.float32) ** 2, axis=2)
        return qn + vn - 2.0 * dots
    return -dots


def pointwise_scores(
    a: jnp.ndarray,  # [B, D]
    b: jnp.ndarray,  # [B, D]
    metric: Metric,
) -> jnp.ndarray:
    """Elementwise-paired scores ``[B]`` (used for e.g. entry-point distances)."""
    dots = jnp.sum(a.astype(jnp.float32) * b.astype(jnp.float32), axis=-1)
    if metric is Metric.L2:
        return jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=-1)
    return -dots
