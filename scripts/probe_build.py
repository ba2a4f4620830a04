"""Probe: build-phase wall-clock at bench scale on the real device.

Usage: BUILD_SB=1024 BUILD_EXPAND=1 python scripts/probe_build.py [N]
Caches the groundtruth so repeated probes only time the build itself.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402
import roargraph_tpu as rt  # noqa: E402
from roargraph_tpu.build import build_roargraph  # noqa: E402
from roargraph_tpu.ops.topk import knn  # noqa: E402
from roargraph_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_TRAIN, N_EVAL, D, SEED = 50_000, 8_192, 200, 0
SB = int(os.environ.get("BUILD_SB", 1024))
PB = int(os.environ.get("BUILD_PB", 1024))
EXPAND = int(os.environ.get("BUILD_EXPAND", 1))

base, train_q, eval_q = benchmod.make_data(N, N_TRAIN, N_EVAL, D, SEED)
import jax.numpy as jnp
base_dev = jnp.asarray(base)

gt_cache = os.path.join("build", f"bench_gt_{N}_{N_TRAIN}_{D}_{SEED}.npz")
if os.path.exists(gt_cache):
    with np.load(gt_cache) as z:
        train_ids = z["ids"]
    print("gt loaded from cache", file=sys.stderr)
else:
    t0 = time.time()
    train_ids, _ = knn(train_q, base_dev, k=100, metric="ip",
                       query_batch=8192)
    print(f"gt: {time.time()-t0:.1f}s", file=sys.stderr)
    os.makedirs("build", exist_ok=True)
    np.savez(gt_cache[:-4], ids=train_ids)

cfg = rt.BuildConfig(metric="ip", M_sq=100, M_pjbp=35, L_pjpq=500,
                     prune_batch=PB, search_batch=SB, search_expand=EXPAND)
t0 = time.time()
graph, report = build_roargraph(base_dev, train_ids, cfg, verbose=True)
print(f"TOTAL build: {time.time()-t0:.1f}s  proj={report.projection_s:.1f}s "
      f"conn={report.connectivity_s:.1f}s  SB={SB} EXPAND={EXPAND}",
      file=sys.stderr)
print(f"stats: {report.stats}", file=sys.stderr)
out = os.path.join("build", f"probe_idx_{N}_{SB}_{EXPAND}.npz")
graph.save_npz(out)
print(f"saved {out}", file=sys.stderr)
