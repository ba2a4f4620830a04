"""A/B the candidate hop-stage optimizations at serving shapes.

1. neighbor centroid-score lookup: element gather vs one-hot einsum
2. visited: bitmask gather/scatter vs expanded-list compare
3. running top-k merge: lax.top_k vs iterative max k-selection
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

B = int(os.environ.get("PROBE_BATCH", 8192))
K = int(os.environ.get("PROBE_K", 559))
Mc, Lc, T, K_TOP, Cc = 32, 24, 24, 10, 256
REPS = 20
rng = np.random.default_rng(0)
s = jnp.asarray(rng.random((B, K)).astype(np.float32))
nbr = jnp.asarray(rng.integers(0, K, (B, Mc)).astype(np.int32))
xlist = jnp.asarray(rng.integers(0, K, (B, T)).astype(np.int32))
visited = jnp.zeros((B, (K + 31) // 32), jnp.uint32)
rk_d = jnp.asarray(rng.random((B, K_TOP)).astype(np.float32))
rk_i = jnp.asarray(rng.integers(0, 10**6, (B, K_TOP)).astype(np.int32))
sc = jnp.asarray(rng.random((B, Cc)).astype(np.float32))
ids_b = jnp.asarray(rng.integers(0, 10**6, (B, Cc)).astype(np.int32))
b_arange = jnp.arange(B)


def timeit(fn, *args):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / REPS * 1e3


# --- 1. neighbor score lookup ------------------------------------------
g1 = jax.jit(lambda ss, nn: ss[b_arange[:, None], nn])


@jax.jit
def g2(ss, nn):
    oh = (nn[:, :, None] == jnp.arange(K)[None, None, :]).astype(ss.dtype)
    return jnp.einsum("bmk,bk->bm", oh, ss)


print(f"B={B} K={K} Mc={Mc} T={T}")
print(f"score lookup gather: {timeit(g1, s, nbr):7.3f} ms")
print(f"score lookup onehot: {timeit(g2, s, nbr):7.3f} ms")
r1, r2 = g1(s, nbr), g2(s, nbr)
print(f"  max diff: {float(jnp.max(jnp.abs(r1 - r2))):.2e}")

# --- 2. visited test ----------------------------------------------------
v1 = jax.jit(lambda vis, nn: (vis[b_arange[:, None], nn // 32] >>
                              (nn % 32).astype(jnp.uint32)) & 1)
v2 = jax.jit(lambda xl, nn: jnp.any(nn[:, :, None] == xl[:, None, :],
                                    axis=2))
print(f"visited bitmask:     {timeit(v1, visited, nbr):7.3f} ms")
print(f"visited list cmp:    {timeit(v2, xlist, nbr):7.3f} ms")

# set side
v1s = jax.jit(lambda vis, f: vis.at[b_arange, f // 32].set(
    vis[b_arange, f // 32] | (jnp.uint32(1) << (f % 32).astype(jnp.uint32))))
v2s = jax.jit(lambda xl, f, t: jax.lax.dynamic_update_slice_in_dim(
    xl, f[:, None], t, axis=1))
f = nbr[:, 0]
print(f"visited set scatter: {timeit(v1s, visited, f):7.3f} ms")
print(f"visited set slice:   {timeit(v2s, xlist, f, 3):7.3f} ms")


# --- 3. running top-k merge --------------------------------------------
@jax.jit
def m1(rd, ri, ss, ib):
    all_d = jnp.concatenate([rd, ss], axis=1)
    all_i = jnp.concatenate([ri, ib], axis=1)
    neg, pos = jax.lax.top_k(-all_d, K_TOP)
    return -neg, jnp.take_along_axis(all_i, pos, axis=1)


@jax.jit
def m2(rd, ri, ss, ib):
    all_d = jnp.concatenate([rd, ss], axis=1)
    all_i = jnp.concatenate([ri, ib], axis=1)
    n = all_d.shape[1]
    iota = jnp.arange(n)[None, :]

    def pick(carry, _):
        d, od, oi, j = carry
        p = jnp.argmin(d, axis=1)
        pd = jnp.take_along_axis(d, p[:, None], axis=1)[:, 0]
        pi = jnp.take_along_axis(all_i, p[:, None], axis=1)[:, 0]
        od = jax.lax.dynamic_update_slice_in_dim(od, pd[:, None], j, axis=1)
        oi = jax.lax.dynamic_update_slice_in_dim(oi, pi[:, None], j, axis=1)
        d = jnp.where(iota == p[:, None], jnp.inf, d)
        return (d, od, oi, j + 1), None

    init = (all_d, jnp.zeros((B, K_TOP), jnp.float32),
            jnp.zeros((B, K_TOP), jnp.int32), 0)
    (d, od, oi, _), _ = jax.lax.scan(pick, init, None, length=K_TOP)
    return od, oi


print(f"topk merge top_k:    {timeit(m1, rk_d, rk_i, sc, ids_b):7.3f} ms")
print(f"topk merge iter-max: {timeit(m2, rk_d, rk_i, sc, ids_b):7.3f} ms")
a1, a2 = m1(rk_d, rk_i, sc, ids_b), m2(rk_d, rk_i, sc, ids_b)
print(f"  dists equal: {bool(jnp.allclose(jnp.sort(a1[0]), jnp.sort(a2[0])))}")
