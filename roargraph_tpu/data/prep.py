"""Dataset preparation tooling — the L7 layer (SURVEY.md §2.4).

Covers the reference's Python/shell prep pipeline for the three paper
datasets without assuming network access (this environment has none; the
functions operate on already-downloaded artifacts):

- :func:`export_fbin_from_npy` — concatenate npy embedding shards into
  ``base.fbin`` / ``query.train.fbin`` (parity with
  ``export_fbin_from_npy.py:1-42``, used for laion-10M).
- :func:`webvid_mean_pool` — per-video mean of row-normalized CLIP frame
  embeddings, re-normalized, appended to an fbin (parity with
  ``prepare_for_clip_webvid.py``'s core transform; dim 512).
- :func:`patch_fbin_npts` — rewrite the npts header after truncating a
  download (parity with ``change_meta_data_in_file.py``).
- :func:`truncate_fbin` — keep the first n rows (the reference does this
  with dd + header patch, ``prepare_data.sh:28-37``).
- :class:`DatasetSpec` / ``REGISTRY`` — the three paper datasets with their
  metric, dim and canonical file names (``README.md:41-50``).
"""
from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

from .. import io as rio


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    dim: int
    metric: str
    n_base: int
    base_file: str
    train_query_file: str
    query_file: str
    gt_file: str


REGISTRY = {
    # Yandex Text-to-Image: 200-d, inner product (``prepare_data.sh:20-27``)
    "t2i-10M": DatasetSpec(
        name="t2i-10M", dim=200, metric="ip", n_base=10_000_000,
        base_file="base.10M.fbin",
        train_query_file="query.train.10M.fbin",
        query_file="query.public.100K.fbin",
        gt_file="gt.public.100K.ibin"),
    # LAION CLIP image/text: 512-d normalized, IP (``prepare_data.sh:39-58``)
    "laion-10M": DatasetSpec(
        name="laion-10M", dim=512, metric="ip", n_base=10_000_000,
        base_file="base.10M.fbin",
        train_query_file="query.train.10M.fbin",
        query_file="query.public.10k.fbin",
        gt_file="gt.public.10k.ibin"),
    # CLIP-WebVid video/text: 512-d (``prepare_for_clip_webvid.py:68``)
    "webvid-2.5M": DatasetSpec(
        name="webvid-2.5M", dim=512, metric="ip", n_base=2_500_000,
        base_file="base.2.5M.fbin",
        train_query_file="query.train.2.5M.fbin",
        query_file="query.public.10k.fbin",
        gt_file="gt.public.10k.ibin"),
}


def export_fbin_from_npy(npy_paths: Sequence[str], out_path: str,
                         *, dtype=np.float32) -> int:
    """Concatenate npy shards row-wise into one fbin. Returns rows written.

    Streams shard-by-shard — no full-dataset resident copy (the reference
    loads everything at once, ``export_fbin_from_npy.py``)."""
    total, dim = 0, None
    for p in npy_paths:
        arr = np.load(p, mmap_mode="r")
        if dim is None:
            dim = arr.shape[1]
        elif arr.shape[1] != dim:
            raise ValueError(f"{p}: dim {arr.shape[1]} != {dim}")
        total += arr.shape[0]
    with open(out_path, "wb") as f:
        np.array([total, dim], dtype="<u4").tofile(f)
        for p in npy_paths:
            arr = np.load(p, mmap_mode="r")
            np.ascontiguousarray(arr, dtype=dtype).tofile(f)
    return total


def webvid_mean_pool(frame_embeddings: np.ndarray) -> np.ndarray:
    """One video's embedding: mean of row-normalized frame embeddings,
    re-normalized (``prepare_for_clip_webvid.py`` core transform)."""
    f = np.asarray(frame_embeddings, np.float32)
    norms = np.linalg.norm(f, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mean = (f / norms).mean(axis=0)
    n = np.linalg.norm(mean)
    return mean / (n if n else 1.0)


def webvid_build_fbin(videos: Iterable[np.ndarray], out_path: str,
                      dim: int = 512) -> int:
    """Stream per-video frame-embedding arrays into the pooled fbin."""
    count = 0
    with open(out_path, "wb") as f:
        np.array([0, dim], dtype="<u4").tofile(f)
        for frames in videos:
            webvid_mean_pool(frames).astype("<f4").tofile(f)
            count += 1
    rio.patch_npts(out_path, count)
    return count


def patch_fbin_npts(path: str, new_npts: int) -> None:
    rio.patch_npts(path, new_npts)


def truncate_fbin(path: str, n_rows: int, *, dtype=np.float32) -> None:
    """Keep the first ``n_rows`` rows, fixing the header (the reference's
    dd + patch dance, ``prepare_data.sh:28-37``)."""
    npts, dim = rio.load_meta(path, dtype)
    if n_rows > npts:
        raise ValueError(f"{path} has only {npts} rows")
    itemsize = np.dtype(dtype).itemsize
    with open(path, "r+b") as f:
        f.truncate(8 + n_rows * dim * itemsize)
    rio.patch_npts(path, n_rows)
