"""Probe: phase-B per-batch cost at laion shard shape (D=512, ip).

Ranks (search_batch B, expand_width E) combos for the laion-10M chain's
phase B in the production configuration (visited_mode="dedup",
gather_chunk=0, split step) BEFORE committing ~8 h of shard builds to one.
Round-3's "expand_width does not pay" verdict was measured on the
bitmask-visited engine; the dedup rewrite removed the fixed-cost scatter
that made E>1 neutral, so it must be re-measured.

Data is generated ON DEVICE (jax.random) — the host core is typically busy
generating the real 10M cache in parallel, and this probe must not compete
for it. The supply graph is random-M; per-hop cost does not depend on edge
quality, and hops-to-convergence is reported so any divergence is visible.

Usage: python scripts/probe_phaseb_laion.py [N]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from roargraph_tpu.build import _phase_b_step_split  # noqa: E402
from roargraph_tpu.graph import PAD  # noqa: E402
from roargraph_tpu.search import beam_search_batch  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
D = int(os.environ.get("PROBE_D", 512))
L = 500
M = 35
W = 2 * M
SHARD = 1_250_000  # wall extrapolation target

key = jax.random.PRNGKey(0)
kb, kg = jax.random.split(key)
base_dev = jax.random.normal(kb, (N, D), jnp.float32)
base_dev = base_dev / jnp.linalg.norm(base_dev, axis=1, keepdims=True)
base_dev.block_until_ready()
# random supply adjacency, first M slots filled
adj = jax.random.randint(kg, (N, M), 0, N, jnp.int32)
supply_i0 = jnp.concatenate(
    [adj, jnp.full((N, W - M), PAD, jnp.int32)], axis=1)
supply_d0 = jnp.where(supply_i0 == PAD, jnp.inf, 1.0).astype(jnp.float32)
proj_i0 = adj
ep = 0
print(f"probe data ready N={N} D={D}", file=sys.stderr, flush=True)

combos = [
    dict(B=2048, E=1),   # production default (t2i-10M chain)
    dict(B=4096, E=1),
    dict(B=8192, E=1),
    dict(B=2048, E=2),
    dict(B=2048, E=4),
    dict(B=4096, E=4),
]
n_batches = 3
for c in combos:
    B, E = c["B"], c["E"]
    si, sd = supply_i0, supply_d0
    deg = jnp.sum(si != PAD, axis=1).astype(jnp.int32)
    ts, tp, hops_seen = [], [], []
    try:
        for bi in range(n_batches):
            s = bi * B
            nodes_dev = jnp.arange(s, s + B, dtype=jnp.int32)
            t0 = time.time()
            res = beam_search_batch(
                si, base_dev, base_dev[nodes_dev], jnp.int32(ep),
                k=1, L=L, metric="ip", max_hops=16 * L + 64,
                capture=L, exclude_self=True, self_ids=nodes_dev,
                expand_width=E, visited_mode="dedup", gather_chunk=0)
            hops = int(np.asarray(res.hops).max())
            ts.append(time.time() - t0)
            hops_seen.append(hops)
            t0 = time.time()
            si, sd, deg = _phase_b_step_split(
                si, sd, deg, res.ret_ids, res.ret_dists, nodes_dev,
                jnp.ones(B, bool), proj_i0, base_dev,
                metric="ip", M=M, W=W, prune_chunk=256)
            int(deg[0])  # force
            tp.append(time.time() - t0)
    except Exception as e:  # noqa: BLE001 — record faults, keep probing
        print(f"B={B} E={E}: FAILED {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        continue
    search_s, step_s = np.mean(ts[1:]), np.mean(tp[1:])
    per_node_us = (search_s + step_s) / B * 1e6
    est = (search_s + step_s) * (SHARD / B)
    print(f"B={B} E={E}: search {search_s:.2f}s step {step_s:.2f}s "
          f"hops~{hops_seen[-1]} per-node {per_node_us:.0f}us "
          f"-> est 1.25M-shard phaseB {est:.0f}s "
          f"(x8 shards {est * 8 / 3600:.1f}h)",
          file=sys.stderr, flush=True)
