"""Bisect _scan_clusters_grouped with IN-JIT loop timing: each stage runs R
iterations inside one compiled fori_loop (data-dependent carry so nothing is
CSE'd away); per-iteration cost = wall / R. Single-op timings through the
tunnel are floored at per-program overhead (~1.5-3 ms), which the full hop
loop never pays — this probe matches how the stage runs in production.

Stages:
  sortidx  — argsort(f) + rank/row/slot/pos index math
  qstage   — Q = qp[src].reshape(G, nq, Dp) row-gather
  tilegath — tg = tiles_t[tile_of] ([G, Dp, C] HBM buffer)
  matmul   — [G, nq, Dp] @ [G, Dp, C] batched contraction (pre-staged)
  gath+mm  — tilegath+matmul in one op (XLA may fuse the gather)
  outgath  — sg.reshape(G*nq, C)[pos_q] output row-gather
  full     — the shipped _scan_clusters_grouped

Usage: python scripts/probe_grouped_scan.py [K] [B]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.tiles import _scan_clusters_grouped  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

K = int(sys.argv[1]) if len(sys.argv) > 1 else 559
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
C, Dp = 256, 224
NQ = 64
R = int(os.environ.get("PROBE_REPS", 30))
from roargraph_tpu.tiles import _num_groups  # noqa: E402
G = _num_groups(K, B, NQ)

rng = np.random.default_rng(0)
tiles_t = jnp.asarray(rng.standard_normal((K, Dp, C)).astype(np.float32)
                      .astype(jnp.bfloat16))
qp = jnp.asarray(rng.standard_normal((B, Dp)).astype(np.float32))
hot = rng.integers(0, max(K // 16, 1), B)
unif = rng.integers(0, K, B)
f0 = jnp.asarray(np.where(rng.random(B) < 0.5, hot, unif).astype(np.int32))


def grouping(f):
    ord_ = jnp.argsort(f, stable=True)
    fs = f[ord_]
    idx = jnp.arange(B, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
    firstidx = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - firstidx
    boundary = first | (rank % NQ == 0)
    row = jnp.cumsum(boundary.astype(jnp.int32)) - 1
    slot = rank % NQ
    tile_of = jnp.zeros((G,), jnp.int32).at[row].max(fs)
    pos = row * NQ + slot
    src = jnp.zeros((G * NQ,), jnp.int32).at[pos].set(ord_)
    pos_q = jnp.zeros((B,), jnp.int32).at[ord_].set(pos)
    return tile_of, src, pos_q


tile_of0, src0, pos_q0 = jax.block_until_ready(jax.jit(grouping)(f0))
Q0 = qp[src0].reshape(G, NQ, Dp)
tg0 = tiles_t[tile_of0]
sg0 = jax.lax.dot_general(Q0, tg0,
                          dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
jax.block_until_ready((Q0, tg0, sg0))


def loop_time(body, init):
    """body(i, carry) -> carry; returns ms/iter via in-jit fori_loop."""
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, R, body, c))
    out = jax.block_until_ready(fn(init))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(init))
    return (time.perf_counter() - t0) / R * 1e3, out


def perturb(i, f):
    # new frontier each iter (cheap): rotate cluster ids
    return (f + i) % K


ms, _ = loop_time(lambda i, c: (perturb(i, c[0]),
                                c[1] + grouping(perturb(i, c[0]))[0][0]),
                  (f0, jnp.int32(0)))
base_ms, _ = loop_time(lambda i, c: ((perturb(i, c[0]), c[1] + 1)),
                       (f0, jnp.int32(0)))
print(f"K={K} B={B} G={G} C={C} Dp={Dp} dtype={tiles_t.dtype} R={R}")
print(f"sortidx:   {ms - base_ms:7.3f} ms")

ms, _ = loop_time(
    lambda i, c: (jnp.roll(c[0], 1), c[1] + qp[c[0]].reshape(G, NQ, Dp)),
    (src0, jnp.zeros((G, NQ, Dp), jnp.float32)))
print(f"qstage:    {ms:7.3f} ms")

ms, _ = loop_time(
    lambda i, c: ((c[0] + 1) % K, c[1] + tiles_t[c[0]].astype(jnp.float32)),
    (tile_of0, jnp.zeros((G, Dp, C), jnp.float32)))
print(f"tilegath:  {ms:7.3f} ms   ({G * Dp * C * 2 / 1e6:.0f} MB)")

ms, _ = loop_time(
    lambda i, c: (c[0] + jax.lax.dot_general(
        Q0 + c[1], tg0, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32), c[1] + 1.0),
    (jnp.zeros((G, NQ, C), jnp.float32), jnp.float32(0)))
print(f"matmul:    {ms:7.3f} ms")

ms, _ = loop_time(
    lambda i, c: ((c[0] + 1) % K, c[1] + jax.lax.dot_general(
        Q0, tiles_t[c[0]], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)),
    (tile_of0, jnp.zeros((G, NQ, C), jnp.float32)))
print(f"gath+mm:   {ms:7.3f} ms")

ms, _ = loop_time(
    lambda i, c: (jnp.roll(c[0], 1),
                  c[1] + (sg0 + c[1]).reshape(G * NQ, C)[c[0]] * 0.5),
    (pos_q0, jnp.zeros((B, C), jnp.float32)))
print(f"outgath:   {ms:7.3f} ms")

ms, _ = loop_time(
    lambda i, c: ((c[0] + 1) % K,
                  c[1] + _scan_clusters_grouped(tiles_t, c[0], qp)),
    (f0, jnp.zeros((B, C), jnp.float32)))
print(f"full:      {ms:7.3f} ms")

if jax.default_backend() == "tpu":
    from roargraph_tpu.tiles import _scan_clusters_grouped_pallas
    for nq in (32, 64, 128):
        ms, _ = loop_time(
            lambda i, c: ((c[0] + 1) % K, c[1] + _scan_clusters_grouped_pallas(
                tiles_t, c[0], qp, nq_max=nq)),
            (f0, jnp.zeros((B, C), jnp.float32)))
        print(f"full grouped_pallas nq={nq:3d}: {ms:7.3f} ms")
    for nq in (32, 128):
        ms, _ = loop_time(
            lambda i, c: ((c[0] + 1) % K, c[1] + _scan_clusters_grouped(
                tiles_t, c[0], qp, nq_max=nq)),
            (f0, jnp.zeros((B, C), jnp.float32)))
        print(f"full grouped nq={nq:3d}:        {ms:7.3f} ms")
