"""10M serving tuning: decouple the cluster-queue width Lc from T.

The first completed 10M serve (eval_t2i10m_tiles.json) cleared the target
at T=768 / Lc=2T=1536 but at 486 QPS: per-hop queue maintenance scales with
Lc while the scan term is Lc-invariant, so at 10M the default Lc=2T makes
the queue the dominant cost (per-hop wall 21.8 ms at B=8192 vs ~4 ms at the
1M shapes where Lc=192). This probe sweeps (T, Lc) pairs over the cached
int8 tile index to find the QPS-optimal queue width at recall>=0.95, plus
early-exit arms (easy queries stop hopping; T becomes a cap).

Artifact: eval_t2i10m_lc.json. Usage: python scripts/probe_10m_lc.py
Env: LC_POINTS="T:Lc[:ee],..." overrides the default grid.
"""
import json
import os
import sys
import time

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_hostmem",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "roargraph_tpu", "utils", "hostmem.py"))
_hostmem = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_hostmem)
_hostmem.harden()

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod  # noqa: E402

N = int(os.environ.get("B10M_N", 10_000_000))
N_TRAIN = int(os.environ.get("B10M_TRAIN", 1_250_000))
N_EVAL = 8192
D = int(os.environ.get("B10M_D", 200))
TAG = os.environ.get("B10M_TAG", f"t2i{N // 1_000_000}m")
K = 10

# (T, Lc, early_exit, dedup_impl, expand_batch). Round-4 measured facts:
# Lc=T is the queue floor (Lc<T truncates the walk) and beats Lc=2T by
# +42% at identical recall; early-exit programs at this K kill the worker
# (skipped by default). The flags+expand_batch arms measure the two
# engine levers that amortize the remaining per-hop queue cost: bitmap
# dedup (constant in T/Lc) and E expansions per queue sort.
DEFAULT_POINTS = [
    (768, 768, False, "compare", 1),   # round-4 best serial point
    (768, 768, False, "flags", 1),     # dedup lever alone
    (768, 768, False, "flags", 4),
    (768, 768, False, "flags", 8),
    (768, 768, False, "flags", 16),
    (768, 768, False, "flags", 32),
]


def main():
    import jax.numpy as jnp

    from roargraph_tpu import eval as reval
    from roargraph_tpu.tiles import TileIndex, tile_search, upload
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    _, _, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D, 0, TAG)
    with np.load(os.path.join("build", f"{TAG}_eval_gt.npz")) as z:
        gt_ids = z["ids"][:, :K].astype(np.int64)

    p8 = os.path.join("build", f"{TAG}_tiles256_int8.npz")
    tidx = TileIndex.load_npz(p8)
    print(f"loaded {p8} K={tidx.num_clusters}", flush=True)
    points = DEFAULT_POINTS
    if os.environ.get("LC_POINTS"):
        # token: "T:Lc[:ee][:flags][:eN]" — ee=early_exit, flags=bitmap
        # dedup, eN=expand_batch N (implies flags)
        points = []
        for tok in os.environ["LC_POINTS"].split(","):
            parts = tok.split(":")
            ee, dd, eb = False, "compare", 1
            for p in parts[2:]:
                if p == "ee":
                    ee = True
                elif p == "flags":
                    dd = "flags"
                elif p.startswith("e"):
                    eb, dd = int(p[1:]), "flags"
            points.append((int(parts[0]), int(parts[1]), ee, dd, eb))
    if any(p[2] for p in points):
        tidx = tidx.with_radii()
    dev = upload(tidx)
    q_dev = jnp.asarray(eval_q)

    out = {"tag": TAG, "n": N, "k": K, "points": []}
    path = f"eval_{TAG}_lc.json"
    for T, Lc, ee, dd, eb in points:
        bsz = 4096 if T >= 1024 else 8192

        def fn(_T, _Lc=Lc, _ee=ee, _b=bsz, _dd=dd, _eb=eb):
            return tile_search(tidx, q_dev, k=K, T=int(_T), Lc=_Lc,
                               metric="ip", batch_size=_b,
                               device_arrays=dev, early_exit=_ee,
                               dedup_impl=_dd, expand_batch=_eb)

        rows = reval.sweep(fn, [T], gt_ids, k=K, metric="ip",
                           n_queries=N_EVAL, verbose="stderr", raw=True,
                           knob="T")
        r = rows[0]
        out["points"].append({"T": T, "Lc": Lc, "early_exit": ee,
                              "dedup": dd, "expand_batch": eb,
                              "qps": r["qps"], "recall": r["recall"],
                              "avg_hops": r["avg_hops"],
                              "avg_visited": r["avg_cmps"]})
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"T={T} Lc={Lc} ee={ee} {dd} E={eb}: {r['qps']:.0f} qps "
              f"recall {r['recall']:.4f} hops {r['avg_hops']:.0f}",
              flush=True)
    ok = [p for p in out["points"] if p["recall"] >= 0.95]
    best = max(ok, key=lambda p: p["qps"], default=None)
    out["best_at_0.95"] = best
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
