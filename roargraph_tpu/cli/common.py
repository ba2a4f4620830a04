"""Shared CLI helpers (argparse replaces the reference's
boost::program_options drivers, SURVEY.md §2.2)."""
from __future__ import annotations

import argparse

import numpy as np

from .. import io as rio
from ..config import Metric
from ..ops.distance import normalize


def add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data_type", default="float",
                   choices=["float"], help="data type (float)")
    p.add_argument("--dist", required=True, choices=["l2", "ip", "cosine"],
                   help="distance function")
    p.add_argument("--num_threads", "-T", type=int, default=0,
                   help="CPU engine threads (0 = all); the TPU engine "
                        "batches instead of threading")


def load_vectors(path: str, metric: Metric) -> np.ndarray:
    data = rio.load_fbin(path)
    if metric.needs_normalize:
        data = np.asarray(normalize(np.asarray(data)))
    return np.asarray(data)
