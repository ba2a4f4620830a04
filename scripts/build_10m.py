"""The 10M-point headline protocol (t2i-shaped, 200-d MIPS), single chip.

The reference's canonical run is a 10M build + L_pq sweep
(``/root/reference/README.md:92-120``, ``run_roargraph_test.sh:5-9``) on a
64-thread AVX-512 box. On TPU the scale-out design shards the base set
(SURVEY §5.8 / dist.sharded): 8 shards of 1.25M, each an independent
RoarGraph build — on a pod slice all 8 run concurrently (the SPMD program,
mesh-validated every round); on this one-chip tunnel they run sequentially,
so the 8-chip projected build wall is max(per-shard wall), which this script
reports.

Per shard: exact-scored approx-selected local train GT (``knn approx=True``
— per-tile ``approx_min_k`` pre-selection, exact scores; order noise in the
tail is the moral equivalent of the reference's thread-race
nondeterminism), then the standard build (paper parameters M_sq=100,
M_pjbp=35, L_pjpq=500). Every stage is cached/checkpointed under build/ so
an interrupted run resumes.

Usage: python scripts/build_10m.py [first_shard [last_shard]]
"""
import json
import os
import sys
import time

# Slow-first-touch VM mitigation (roargraph_tpu/utils/hostmem.py): stop the
# host's proactive reclaim + keep freed numpy temps in the glibc arena.
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
# Train-query count: the data cache holds N/2 rows (the 1M protocol's 1:2
# ratio), but the tunnel's effective GT rate (~0.5 TFLOP/s measured across
# rounds — dispatch/relay-bound, not MXU-bound) prices 5M x 10M GT at ~12 h.
# The executed 10M protocol therefore uses the first N/8 training queries
# (1:8): build-input NN lists only; eval GT is untouched. Raise B10M_TRAIN
# when GT throughput allows.
N_TRAIN = int(os.environ.get("B10M_TRAIN", 1_250_000))
N_EVAL = 8192
D = int(os.environ.get("B10M_D", 200))
SEED = 0
S = int(os.environ.get("B10M_SHARDS", 8))
TAG = os.environ.get("B10M_TAG", f"t2i{N // 1_000_000}m")

first = int(sys.argv[1]) if len(sys.argv) > 1 else 0
last = int(sys.argv[2]) if len(sys.argv) > 2 else S - 1


def main():
    import jax.numpy as jnp

    import roargraph_tpu as rt
    from roargraph_tpu.build import build_roargraph
    from roargraph_tpu.ops.topk import knn
    from roargraph_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.time()
    base, train_q, eval_q = benchmod.make_data_cached(N, N_TRAIN, N_EVAL, D,
                                                     SEED, TAG,
                                        normalize=bool(os.environ.get("B10M_NORM")))
    print(f"data: {time.time() - t0:.0f}s", flush=True)
    train_dev = None  # uploaded once, lazily (only if some shard needs GT)
    n_s = (N + S - 1) // S
    cfg = rt.BuildConfig(
        metric="ip",
        M_sq=int(os.environ.get("B10M_MSQ", 100)),
        M_pjbp=int(os.environ.get("B10M_MPJBP", 35)),
        L_pjpq=int(os.environ.get("B10M_LPJPQ", 500)),
        prune_batch=1024,
        search_batch=int(os.environ.get("B10M_SEARCH_BATCH", 2048)),
        search_expand=int(os.environ.get("B10M_EXPAND", 1)))
    os.makedirs("build", exist_ok=True)

    # exact eval groundtruth (recall measurement must never be approximate)
    eval_gt = os.path.join("build", f"{TAG}_eval_gt.npz")
    if not os.path.exists(eval_gt):
        t0 = time.time()
        if N * D * 4 > 12 << 30:
            # base won't fit HBM next to the sweep workspace (laion-10M at
            # 512-d is 20.5 GB vs 16 GB on v5e): exact per-shard GT with a
            # host-side top-k merge, checkpointed per shard so a tunnel
            # crash never repays completed shards. Scores stay exact
            # (smaller=better), ids offset into the global space.
            run_i = np.full((N_EVAL, 100), -1, np.int64)
            run_d = np.full((N_EVAL, 100), np.inf, np.float32)
            eval_dev = jnp.asarray(np.asarray(eval_q))
            for s in range(S):
                lo, hi = s * n_s, min((s + 1) * n_s, N)
                ppath = os.path.join("build", f"{TAG}_eval_gt_part{s}.npz")
                if os.path.exists(ppath):
                    with np.load(ppath) as z:
                        ids, dists = z["ids"], z["dists"]
                else:
                    ids, dists = knn(eval_dev, jnp.asarray(base[lo:hi]),
                                     k=100, metric="ip", query_batch=8192)
                    ids = ids.astype(np.int64) + lo
                    np.savez(ppath, ids=ids, dists=dists)
                    print(f"eval gt part {s}: {time.time() - t0:.0f}s",
                          flush=True)
                all_d = np.concatenate([run_d, dists.astype(np.float32)], 1)
                all_i = np.concatenate([run_i, ids], 1)
                order = np.argsort(all_d, axis=1, kind="stable")[:, :100]
                run_d = np.take_along_axis(all_d, order, axis=1)
                run_i = np.take_along_axis(all_i, order, axis=1)
            np.savez(eval_gt, ids=run_i, dists=run_d)
            for s in range(S):
                ppath = os.path.join("build", f"{TAG}_eval_gt_part{s}.npz")
                if os.path.exists(ppath):
                    os.remove(ppath)
        else:
            gt_i, gt_d = knn(eval_q, jnp.asarray(base), k=100, metric="ip",
                             query_batch=8192)
            np.savez(eval_gt, ids=gt_i, dists=gt_d)
        print(f"eval gt: {time.time() - t0:.0f}s", flush=True)

    walls = {}
    for s in range(first, last + 1):
        lo, hi = s * n_s, min((s + 1) * n_s, N)
        gpath = os.path.join("build", f"{TAG}_graph_shard{s}.npz")
        if os.path.exists(gpath):
            print(f"shard {s}: already built", flush=True)
            continue
        t_shard = time.time()
        shard_dev = jnp.asarray(base[lo:hi])
        shard_dev.block_until_ready()
        print(f"shard {s}: vectors on device "
              f"({time.time() - t_shard:.0f}s)", flush=True)

        gt_path = os.path.join("build", f"{TAG}_gt_shard{s}.npz")
        if os.path.exists(gt_path):
            with np.load(gt_path) as z:
                train_ids = z["ids"]
            print(f"shard {s}: cached local gt", flush=True)
        else:
            t0 = time.time()
            if train_dev is None:
                # one 4 GB upload shared by every shard's GT — per-batch
                # H2D re-uploads dominate the sweep through the relay.
                # Pre-padded on host to a query_batch multiple so the device
                # never copies the 4 GB buffer (zero-row results dropped).
                tp = (-N_TRAIN) % 8192
                tq = np.asarray(train_q[:N_TRAIN])  # cache may hold more rows
                trainp = (np.concatenate(
                    [tq, np.zeros((tp, D), np.float32)])
                    if tp else tq)
                train_dev = jnp.asarray(trainp)
                train_dev.block_until_ready()
                del trainp
                print(f"shard {s}: train queries on device "
                      f"({time.time() - t0:.0f}s)", flush=True)
            # Part-sliced with on-disk checkpoints: the TPU worker crashes
            # intermittently under sustained load, and a crash mid-GT must
            # not discard the shard's completed query slices (attempt 1 of
            # this protocol lost ~30 min exactly that way).
            part = 8192 * int(os.environ.get("B10M_GT_PART", "16"))
            pdir = gt_path + ".parts"
            os.makedirs(pdir, exist_ok=True)
            train_ids = np.empty((N_TRAIN, cfg.M_sq), np.uint32)
            n_parts = (N_TRAIN + part - 1) // part
            for p in range(n_parts):
                qlo, qhi = p * part, min((p + 1) * part, N_TRAIN)
                ppath = os.path.join(pdir, f"{p}.npy")
                if os.path.exists(ppath):
                    train_ids[qlo:qhi] = np.load(ppath)
                    continue
                # train_dev is host-padded to a batch multiple, so the slice
                # end may legally overshoot N_TRAIN (zero rows dropped below)
                # DEFAULT precision (bf16 MXU passes) for the TRAIN NN
                # lists only: tail-order noise of the same class as the
                # approx per-tile selection / the reference's thread races.
                # Eval groundtruth stays exact HIGHEST (recall measurement).
                import jax
                prec = {"default": jax.lax.Precision.DEFAULT,
                        "highest": jax.lax.Precision.HIGHEST}[
                    os.environ.get("B10M_GT_PREC", "default")]
                # block-min per-tile selection: 5.4x the approx_min_k rate
                # on this device (scripts/probe_gt_select.py: 4565 vs 841
                # q/s, 99.7% id overlap at the shard GT shape)
                ids, _ = knn(train_dev[qlo: qlo + part], shard_dev,
                             k=cfg.M_sq, metric="ip", query_batch=8192,
                             tile=int(os.environ.get("B10M_GT_TILE", 16384)),
                             precision=prec,
                             approx=os.environ.get("B10M_GT_APPROX", "block"),
                             return_dists=False)
                train_ids[qlo:qhi] = ids[: qhi - qlo]
                np.save(ppath, train_ids[qlo:qhi])
                print(f"shard {s}: gt part {p + 1}/{n_parts} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            np.savez(gt_path, ids=train_ids)
            import shutil
            shutil.rmtree(pdir, ignore_errors=True)
            print(f"shard {s}: local gt {time.time() - t0:.0f}s", flush=True)

        t0 = time.time()
        ckpt = os.path.join("build", f"{TAG}_ckpt_shard{s}")
        # checkpoint_secs > per-shard phase-B wall: the periodic phase-B
        # state fetch (~350 MB D2H) hung the flaky worker mid-build; with
        # ~12-min shard phase-Bs, redoing from the phase-A checkpoint is
        # cheaper than risking the mid-phase fetch.
        g, rep = build_roargraph(shard_dev, train_ids, cfg, verbose=True,
                                 checkpoint_dir=ckpt, checkpoint_secs=3600.0)
        g.save_npz(gpath)
        walls[s] = time.time() - t_shard
        print(f"shard {s}: build {time.time() - t0:.0f}s "
              f"(total {walls[s]:.0f}s) stats={rep.stats}", flush=True)
        del shard_dev

    done = [s for s in range(S)
            if os.path.exists(os.path.join("build",
                                           f"{TAG}_graph_shard{s}.npz"))]
    print(json.dumps({"tag": TAG, "shards_done": done,
                      "per_shard_wall_s": walls}), flush=True)


if __name__ == "__main__":
    main()
