"""Evaluation harness: recall@k, relative distance error, QPS/latency sweep.

Mirrors the reference drivers' protocol
(``tests/test_search_roargraph.cpp:190-236``):

- recall@k = |returned ∩ gt[:k]| / k averaged over queries (``:23-36``);
- rderr: metric-corrected relative distance error vs gt distances
  (``:38-62`` — IP scores are negated back, cosine mapped to ``2*(1-ip)``);
- per-L_pq row: ``L_pq, QPS, avg_cmps, mean_latency_ms, recall@k, avg_hops``
  printed and optionally appended to a CSV (``:231-236``);
- timing wall-clocks the whole query set after a warmup pass (``:197-213``).
"""
from __future__ import annotations

import csv
import sys
import time
from typing import Callable, Iterable, Sequence

import numpy as np

from .config import Metric, SearchConfig
from .graph import PaddedGraph
from . import search as rsearch


def recall_at_k(res_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> float:
    """Average id-set intersection with the first k gt ids per query."""
    total = 0
    for r, g in zip(res_ids[:, :k], gt_ids[:, :k]):
        total += len(set(int(x) for x in r) & set(int(x) for x in g))
    return total / (k * res_ids.shape[0])


def rderr(res_dists: np.ndarray, gt_dists: np.ndarray, k: int,
          metric: Metric) -> float:
    """Mean relative distance error, sign-corrected per metric
    (``tests/test_search_bipartite.cpp:39-62``)."""
    r = np.asarray(res_dists[:, :k], np.float64)
    g = np.asarray(gt_dists[:, :k], np.float64)
    if metric is Metric.IP:
        r = -r
    elif metric is Metric.COSINE:
        r = 2.0 * (1.0 - (-r))
    err = np.abs(r - g) / np.abs(g)
    return float(err.mean())


def sweep(
    search_fn: Callable[[SearchConfig], tuple],
    L_values: Sequence[int],
    gt_ids: np.ndarray,
    *,
    k: int,
    metric: Metric,
    n_queries: int,
    gt_dists: np.ndarray | None = None,
    warmup: bool = True,
    warmup_fn: Callable | None = None,
    csv_path: str | None = None,
    verbose: bool = True,
    raw: bool = False,
    knob: str = "L_pq",
) -> list:
    """Run the L_pq sweep. ``search_fn(cfg)`` must return
    (ids, dists, cmps, hops) for the full query set.

    With ``raw=True`` the sweep values are passed to ``search_fn`` verbatim
    (engines whose knob is not an L_pq — e.g. the tile engine's T, which may
    legitimately be smaller than k — build their own config).

    ``knob`` names the sweep column. When it is not the reference's ``L_pq``
    the CSV gets a leading ``#``-comment tag row so a tile-engine sweep (T =
    clusters scanned) can never be silently misread as an L_pq sweep by a
    consumer comparing reference-format CSVs.

    Returns a list of row dicts; optionally writes the reference's CSV."""
    rows = []
    out = sys.stderr if verbose == "stderr" else sys.stdout
    if verbose:
        print(f"{knob}\tQPS\tavg_visited\tmean_latency\trecall@{k}\tavg_hops",
              file=out)
    for L in L_values:
        cfg = int(L) if raw else SearchConfig(k=k, L_pq=int(L), metric=metric)
        warm_dt = float("inf")
        if warmup:
            # compile + warm caches (parity: ``:198-200``). The reference
            # warms with 100 serial queries, not a full pass; callers of big
            # sweeps pass ``warmup_fn`` running one batch-worth of queries
            # (the smallest unit that compiles the exact timed program), so
            # the sweep doesn't pay 2x wall at large Q. A full-pass warmup
            # additionally feeds the auxiliary qps_best column.
            if warmup_fn is not None:
                warmup_fn(cfg)
            else:
                t0 = time.perf_counter()
                search_fn(cfg)
                warm_dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        ids, dists, cmps, hops = search_fn(cfg)
        dt = time.perf_counter() - t0
        # Headline timing = the single post-warmup pass, the reference's
        # protocol (``tests/test_search_roargraph.cpp:197-213``). ``qps_best``
        # additionally keeps the best observed pass (incl. the warmup one) —
        # device time through the shared TPU tunnel is noisy and min-of-n
        # estimates what the hardware can do; it is auxiliary, never the
        # headline.
        qps = n_queries / dt
        rec = recall_at_k(ids, gt_ids, k)
        row = {
            "L_pq": int(L),
            "qps": qps,
            "qps_best": n_queries / min(dt, warm_dt),
            "avg_cmps": float(np.mean(cmps)),
            "mean_latency_ms": dt * 1000.0 / n_queries,
            "recall": rec,
            "avg_hops": float(np.mean(hops)),
        }
        if gt_dists is not None:
            row["rderr"] = rderr(dists, gt_dists, k, metric)
        rows.append(row)
        if verbose:
            print(f"{L}\t{qps:.1f}\t{row['avg_cmps']:.1f}\t"
                  f"{row['mean_latency_ms']:.3f}\t{rec:.4f}\t"
                  f"{row['avg_hops']:.1f}", file=out, flush=True)
        if csv_path:
            # flush after every point (the reference appends per L_pq,
            # ``tests/test_search_roargraph.cpp:233-236``) so a crashed sweep
            # keeps its completed rows
            mode = "w" if len(rows) == 1 else "a"
            with open(csv_path, mode, newline="") as f:
                if mode == "w" and knob != "L_pq":
                    f.write(f"# knob={knob} (not L_pq): first column is "
                            f"{knob}\n")
                w = csv.writer(f)
                cols = [row["L_pq"], row["qps"], row["avg_cmps"],
                        row["mean_latency_ms"], row["recall"]]
                if "rderr" in row:
                    cols.append(row["rderr"])
                cols.append(row["avg_hops"])
                w.writerow(cols)
    return rows


def flat_sweep_batch(n: int, d: int, l_pq: int, cap: int = 8192) -> int:
    """Device batch size for one flat-engine sweep point, bounded so a
    single lockstep program stays well under the tunneled backend's
    long-program fault threshold (worker crashes reproduce at ~60-75 s of
    program wall: N=1M medoid L=500 B=8192; N=100k L>=1200 B=8192 —
    DESIGN.md round-4 notes). Program wall grows ~linearly in batch and
    L_pq (hops) and with per-hop gather cost (which rises with N and D);
    halving the batch halves the wall at <5% QPS cost at these L — the
    points this touches are device-bound, not dispatch-bound."""
    scaled = l_pq * (2 if d >= 384 else 1)  # 512-d hops cost ~2.5x 200-d
    if n >= 500_000:
        if scaled >= 1500:
            b = 512
        elif scaled >= 800:
            b = 1024
        elif scaled >= 300:
            b = 4096
        else:
            b = 8192
    else:
        b = 4096 if scaled >= 1200 else 8192
    return max(1, min(cap, b))


def qps_at_recall(rows: Iterable[dict], target: float) -> float | None:
    """Best QPS among sweep rows meeting the recall target (the paper's
    headline operating point, e.g. recall@10 = 0.95)."""
    best = None
    for row in rows:
        if row["recall"] >= target and (best is None or row["qps"] > best):
            best = row["qps"]
    return best


def sweep_roargraph(graph: PaddedGraph, base, queries, gt_ids, L_values, *,
                    k: int = 10, metric=Metric.IP, batch_size: int = 1024,
                    gt_dists=None, csv_path=None, verbose=True):
    """Convenience sweep over the projection-graph engine."""
    queries = np.asarray(queries)

    def fn(cfg: SearchConfig):
        cfg = SearchConfig(k=cfg.k, L_pq=cfg.L_pq, metric=cfg.metric,
                           batch_size=batch_size)
        return rsearch.search(graph, base, queries, cfg)

    return sweep(fn, L_values, np.asarray(gt_ids), k=k,
                 metric=Metric.parse(metric), n_queries=queries.shape[0],
                 gt_dists=gt_dists, csv_path=csv_path, verbose=verbose)
