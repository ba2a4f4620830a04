"""Probe: does a bf16 base copy speed up the phase-B internal search at
D=512? At D=200 the fresh-vector gather was row-latency-bound (bf16 same
wall — DESIGN.md round-3); at 512-d rows are 2 KB and may be byte-bound,
in which case halving gather bytes approaches 2x on the dominant phase-B
cost. Run AFTER probe_phaseb_laion.py (same shapes, cached compiles).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.graph import PAD  # noqa: E402
from roargraph_tpu.search import beam_search_batch  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
D = 512
L, M, B = 500, 35, 2048

key = jax.random.PRNGKey(0)
kb, kg = jax.random.split(key)
base_dev = jax.random.normal(kb, (N, D), jnp.float32)
base_dev = base_dev / jnp.linalg.norm(base_dev, axis=1, keepdims=True)
adj = jax.random.randint(kg, (N, M), 0, N, jnp.int32)
supply_i0 = jnp.concatenate(
    [adj, jnp.full((N, M), PAD, jnp.int32)], axis=1)
base_bf = base_dev.astype(jnp.bfloat16)
base_bf.block_until_ready()
print(f"probe data ready N={N} D={D}", file=sys.stderr, flush=True)

for name, b in (("f32", base_dev), ("bf16", base_bf)):
    ts, hops_seen = [], []
    for bi in range(3):
        nodes_dev = jnp.arange(bi * B, (bi + 1) * B, dtype=jnp.int32)
        q = base_dev[nodes_dev]  # queries stay f32 either way
        t0 = time.time()
        res = beam_search_batch(
            supply_i0, b, q.astype(b.dtype), jnp.int32(0),
            k=1, L=L, metric="ip", max_hops=16 * L + 64,
            capture=L, exclude_self=True, self_ids=nodes_dev,
            expand_width=1, visited_mode="dedup", gather_chunk=0)
        hops_seen.append(int(np.asarray(res.hops).max()))
        ts.append(time.time() - t0)
    print(f"{name}: search {np.mean(ts[1:]):.2f}s hops~{hops_seen[-1]}",
          file=sys.stderr, flush=True)
