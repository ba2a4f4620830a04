"""Micro-probe: hop-component costs at phase-B shapes on the real device.

Bisects one hop of the lockstep search into its parts and times each in
isolation with its own jitted loop (runs the op R times inside one dispatch
via lax.scan over dummy perturbations, so relay latency amortizes):

  1. 3-operand 2-key lax.sort merge at [B, L+F]      (current queue merge)
  2. rank-based merge (compare-count + scatter)       (candidate replacement)
  3. row gather [B, F] from N x D f32 / bf16          (vector fetch)
  4. sparse visited gather+scatter at W words         (bitmask ops)
  5. frontier select (argmax over [B, L])

Usage: python scripts/probe_merge.py [N] [B] [L] [F] [D]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
L = int(sys.argv[3]) if len(sys.argv) > 3 else 500
F = int(sys.argv[4]) if len(sys.argv) > 4 else 32
D = int(sys.argv[5]) if len(sys.argv) > 5 else 200
R = 50  # repeats inside one dispatch

rng = np.random.default_rng(0)
qd = jnp.asarray(np.sort(rng.random((B, L)).astype(np.float32), axis=1))
qi = jnp.asarray(rng.integers(0, N, (B, L)).astype(np.int32))
qe = jnp.zeros((B, L), jnp.int32)
nd = jnp.asarray(rng.random((B, F)).astype(np.float32))
ni = jnp.asarray(rng.integers(0, N, (B, F)).astype(np.int32))
base32 = jnp.asarray(rng.standard_normal((N, D), dtype=np.float32))
base16 = base32.astype(jnp.bfloat16)
ids = jnp.asarray(rng.integers(0, N, (B, F)).astype(np.int32))
W = (N + 31) // 32
vis = jnp.zeros((B, W), jnp.uint32)
BIG = jnp.int32(2**31 - 1)


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    # force a real fetch (relay: block_until_ready does not wait); use the
    # LAST leaf — the first can be a multi-GB table and astype would copy it
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    float(jnp.asarray(leaves[-1]).astype(jnp.float32).sum())
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(jnp.asarray(leaves[-1]).astype(jnp.float32).sum())
        best = min(best, (time.time() - t0) / R)
    print(f"{name:34s} {best*1e3:8.3f} ms/op", flush=True)
    return best


def rep(body):
    """Run body R times inside one dispatch, threading a carry."""
    @jax.jit
    def run(*args):
        def step(carry, _):
            return body(*carry), None
        out, _ = jax.lax.scan(step, args, None, length=R)
        return out
    return run


# --- 1. lax.sort merge ----------------------------------------------------
def sort_merge(qd, qi, qe, nd, ni):
    ad = jnp.concatenate([qd, nd], axis=1)
    ai = jnp.concatenate([qi, ni], axis=1)
    ae = jnp.concatenate([qe, jnp.zeros_like(ni)], axis=1)
    ad, ai, ae = jax.lax.sort((ad, ai, ae), num_keys=2)
    return ad[:, :L], ai[:, :L], ae[:, :L], nd + 1e-7, ni


# --- 2. rank merge --------------------------------------------------------
def rank_merge(qd, qi, qe, nd, ni):
    # new items first sorted among themselves (F small)
    snd, sni = jax.lax.sort((nd, ni), num_keys=2)
    # how many new items precede each queue item
    lt_q = (snd[:, None, :] < qd[:, :, None]) | (
        (snd[:, None, :] == qd[:, :, None]) & (sni[:, None, :] < qi[:, :, None]))
    q_pos = jnp.arange(L, dtype=jnp.int32)[None, :] + jnp.sum(
        lt_q, axis=2, dtype=jnp.int32)                      # [B, L]
    # how many queue items precede each new item
    lt_n = (qd[:, :, None] < snd[:, None, :]) | (
        (qd[:, :, None] == snd[:, None, :]) & (qi[:, :, None] < sni[:, None, :]))
    n_pos = jnp.arange(F, dtype=jnp.int32)[None, :] + jnp.sum(
        lt_n, axis=1, dtype=jnp.int32)                      # [B, F]
    br_q = jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    br_n = jax.lax.broadcasted_iota(jnp.int32, (B, F), 0)
    od = jnp.full((B, L), jnp.inf, jnp.float32)
    oi = jnp.full((B, L), BIG, jnp.int32)
    oe = jnp.zeros((B, L), jnp.int32)
    qp = jnp.where(q_pos < L, q_pos, L - 1)
    in_q = q_pos < L
    od = od.at[br_q, qp].set(jnp.where(in_q, qd, jnp.inf), mode="drop")
    oi = oi.at[br_q, qp].set(jnp.where(in_q, qi, BIG), mode="drop")
    oe = oe.at[br_q, qp].set(jnp.where(in_q, qe, 0), mode="drop")
    npos = jnp.where(n_pos < L, n_pos, L - 1)
    in_n = n_pos < L
    od = od.at[br_n, npos].set(jnp.where(in_n, snd, od[br_n, npos]),
                               mode="drop")
    oi = oi.at[br_n, npos].set(jnp.where(in_n, sni, oi[br_n, npos]),
                               mode="drop")
    return od, oi, oe, nd + 1e-7, ni


# --- 3. gathers (base passed as arg — closures would constant-fold) -------
def gather32(tbl, ids, acc):
    v = tbl[ids]                                             # [B, F, D]
    return tbl, ids + 1, acc + jnp.sum(v, axis=(1, 2))


def gather16(tbl, ids, acc):
    v = tbl[ids]
    return tbl, ids + 1, acc + jnp.sum(v, axis=(1, 2)).astype(jnp.float32)


# --- 4. visited sparse ----------------------------------------------------
def visited_sparse(vis, ids):
    safe = jnp.clip(ids, 0, N - 1)
    w = safe // 32
    bits = jnp.uint32(1) << (safe % 32).astype(jnp.uint32)
    br = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    words = vis[br, w]
    fresh = (words & bits) == 0
    vis = vis.at[br, w].add(jnp.where(fresh, bits, jnp.uint32(0)))
    return vis, ids + 1


# --- 4b. visited sparse, flat 1-D scatter ---------------------------------
def visited_flat(vis, ids):
    vflat = vis.reshape(-1)
    safe = jnp.clip(ids, 0, N - 1)
    w = safe // 32
    bits = jnp.uint32(1) << (safe % 32).astype(jnp.uint32)
    br = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    flat = (br * W + w).reshape(-1)
    words = vflat[flat]
    fresh = (words & bits.reshape(-1)) == 0
    vflat = vflat.at[flat].add(
        jnp.where(fresh, bits.reshape(-1), jnp.uint32(0)))
    return vflat.reshape(B, W), ids + 1


# --- 4c. visited test only (no set) ---------------------------------------
def visited_test(vis, ids, acc):
    safe = jnp.clip(ids, 0, N - 1)
    w = safe // 32
    bits = jnp.uint32(1) << (safe % 32).astype(jnp.uint32)
    br = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    words = vis[br, w]
    fresh = (words & bits) == 0
    return vis, ids + 1, acc + jnp.sum(fresh.astype(jnp.int32), axis=1)


# --- 5. frontier select ---------------------------------------------------
def frontier(qe, qi):
    unexp = (qe == 0) & (qi != BIG)
    jj = jnp.argmax(unexp, axis=1)
    return qe.at[jnp.arange(B), jj].set(1), qi


print(f"N={N} B={B} L={L} F={F} D={D} W={W} (x{R} per dispatch)")
t_sort = timed("sort_merge [B,L+F] 3op 2key", rep(sort_merge),
               qd, qi, qe, nd, ni)
t_rank = timed("rank_merge compare+scatter", rep(rank_merge),
               qd, qi, qe, nd, ni)
acc0 = jnp.zeros((B,), jnp.float32)
t_g32 = timed(f"gather f32 [B,{F}] rows of {D}", rep(gather32),
              base32, ids, acc0)
t_g16 = timed(f"gather bf16 [B,{F}] rows of {D}", rep(gather16),
              base16, ids, acc0)
t_vis = timed(f"visited sparse W={W}", rep(visited_sparse), vis, ids)
t_vf = timed("visited flat 1-D scatter", rep(visited_flat), vis, ids)
acc_i = jnp.zeros((B,), jnp.int32)
t_vt = timed("visited test only", rep(visited_test), vis, ids, acc_i)
t_fr = timed("frontier argmax+set", rep(frontier), qe, qi)
print(f"\nper-hop estimate (1 chunk): sort={t_sort*1e3:.2f} "
      f"rank={t_rank*1e3:.2f} g32={t_g32*1e3:.2f} g16={t_g16*1e3:.2f} "
      f"vis={t_vis*1e3:.2f} front={t_fr*1e3:.2f} ms")
