"""Typed configuration for roargraph-tpu.

Replaces the reference's stringly-typed ``Parameters`` map
(``include/efanna2e/parameters.h:15-57``) with frozen dataclasses, and the
``Metric`` enum (``include/efanna2e/distance.h:15``) with a Python enum.

Canonical paper parameters (``README.md:97``, ``run_roargraph_test.sh:9``):
``M_sq=100, M_pjbp=35, L_pjpq=500``; search sweeps ``L_pq`` in 10..2000 with
``k=10`` (``run_roargraph_search_test.sh``).
"""
from __future__ import annotations

import dataclasses
import enum


class Metric(enum.Enum):
    """Distance metric. Internally every metric is a *minimized* score.

    Parity with the reference: INNER_PRODUCT returns the negated dot product
    so that smaller-is-better holds (``distance.h:223``); COSINE is
    normalize-then-IP (``src/index.cpp:16-19``, ``src/index_bipartite.cpp:35-37``);
    L2 is the squared euclidean distance (``distance.h:39-89``).
    """

    L2 = "l2"
    IP = "ip"
    COSINE = "cosine"

    @classmethod
    def parse(cls, s: "str | Metric") -> "Metric":
        if isinstance(s, Metric):
            return s
        s = s.lower()
        aliases = {
            "l2": cls.L2,
            "ip": cls.IP,
            "inner_product": cls.IP,
            "mips": cls.IP,
            "cosine": cls.COSINE,
            "cos": cls.COSINE,
        }
        if s not in aliases:
            raise ValueError(f"unknown metric: {s!r}")
        return aliases[s]

    @property
    def needs_normalize(self) -> bool:
        """COSINE pre-normalizes both base and query vectors
        (``src/index_bipartite.cpp:35-37``, ``tests/test_search_roargraph.cpp:167-172``)."""
        return self is Metric.COSINE


# The reference reserves M_pjbp * PROJECTION_SLACK slots per node
# (``src/index_bipartite.cpp:26``); after the supply-edge merge the projection
# degree can reach 3 * M_pjbp (M from re-prune + 2M novel supply edges,
# ``src/index_bipartite.cpp:1251-1269``).
PROJECTION_SLACK = 2
MERGE_SLACK = 3


@dataclasses.dataclass(frozen=True)
class BuildConfig:
    """RoarGraph build parameters (reference flag names kept for parity).

    - ``M_sq``:   NN-list width consumed per training query (``LinkProjection``,
                  ``src/index_bipartite.cpp:1063-1067``).
    - ``M_pjbp``: projection-graph degree bound (occlusion prune target).
    - ``L_pjpq``: beam width of the phase-B internal search
                  (``src/index_bipartite.cpp:1283``).
    """

    metric: Metric = Metric.IP
    M_sq: int = 100
    M_pjbp: int = 35
    L_pjpq: int = 500
    # Device batch sizes for the vectorized build phases (no semantic effect).
    prune_batch: int = 2048
    search_batch: int = 1024
    # Cap on recorded expansions in the phase-B internal search (the reference
    # records every expansion; expansions rarely exceed a few times L).
    max_hops_factor: int = 4
    # Frontier nodes expanded per lockstep step of the phase-B internal
    # search. 1 = strict best-first (reference expansion order, the parity
    # default); >1 trades exact expansion order for ~E x fewer loop steps —
    # the expanded candidate set (and hence the built graph) changes
    # order-level, like the reference's own thread-race nondeterminism.
    search_expand: int = 1

    def __post_init__(self):
        object.__setattr__(self, "metric", Metric.parse(self.metric))
        if self.M_sq < 2:
            raise ValueError("M_sq must be >= 2")
        if self.M_pjbp < 1:
            raise ValueError("M_pjbp must be >= 1")
        if self.L_pjpq < self.M_pjbp:
            raise ValueError("L_pjpq must be >= M_pjbp")

    @property
    def max_degree(self) -> int:
        """Padded adjacency width of the final projection graph."""
        return MERGE_SLACK * self.M_pjbp


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Query-time parameters (``tests/test_search_roargraph.cpp:191-196``)."""

    k: int = 10
    L_pq: int = 100
    metric: Metric = Metric.IP
    # Queries advance in lockstep; this is the device batch.
    batch_size: int = 1024
    # Safety bound on the while_loop (reference loops until queue exhaustion,
    # ``src/index_bipartite.cpp:2356``; expansions are bounded in practice).
    max_hops: int | None = None
    # Perf knobs for the TPU engine (semantics documented on
    # ``search.beam_search_batch``): fresh-neighbor gather chunk and number
    # of frontier nodes expanded per lockstep step.
    gather_chunk: int = 32
    expand_width: int = 1
    # Segmented serving engine: run bounded-hop segments and compact finished
    # queries out of the batch between segments (kills the slowest-query
    # straggler tax; per-query results/cmps/hops are bit-identical).
    segmented: bool = False
    segment_hops: int | None = None
    # Raise when a query ends with fewer than k reachable results (parity
    # with the reference's runtime check, ``src/index_bipartite.cpp:2408``).
    check_min_results: bool = False
    # When a SeedIndex is supplied to search(): number of per-query start
    # candidates from the coarse quantizer (0 = medoid-only, reference
    # parity). Seeding only *adds* start candidates; recall at a given L is
    # unchanged or better, hops drop on large corpora.
    n_seeds: int = 0
    # Pad the queue to this static width and treat L_pq as a runtime value:
    # one compiled program then serves every L_pq <= L_bucket (sweeps stop
    # recompiling per point). None = compile per L_pq.
    L_bucket: int | None = None
    # Visited-set implementation: "bitmask" (reference-parity cmps
    # accounting) or "dedup" (no visited state at all — duplicates collapse
    # by id in the queue merge; identical ids/dists/hops and expansion
    # sequence, re-scores uncounted in cmps). "dedup" removes the hop's
    # largest cost at N >= ~1M (the bitmask gather/scatter).
    visited_mode: str = "bitmask"

    def __post_init__(self):
        object.__setattr__(self, "metric", Metric.parse(self.metric))
        if self.L_pq < self.k:
            # parity: ``tests/test_search_roargraph.cpp:192-195``
            raise ValueError("L_pq must be greater or equal than k")
        if self.L_bucket is not None and self.L_bucket < self.L_pq:
            raise ValueError("L_bucket must be >= L_pq")
        if self.visited_mode not in ("bitmask", "dedup"):
            raise ValueError("visited_mode must be 'bitmask' or 'dedup'")

    @property
    def effective_max_hops(self) -> int:
        if self.max_hops is not None:
            return self.max_hops
        return 16 * self.L_pq + 64
