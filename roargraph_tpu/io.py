"""Binary I/O: big-ann ``fbin``/``ibin`` vectors, groundtruth files, and the
reference's index formats.

Wire formats (bit-compatible with the reference — SURVEY.md §2.5):

- **fbin/ibin**: ``u32 npts, u32 dim``, then ``npts*dim`` little-endian scalars,
  row-major (validated like ``util.h:106-127``).
- **groundtruth**: ``u32 npts, u32 K``, then ``npts*K`` u32 ids, then ``npts*K``
  f32 distances (``util.h:129-155``; size check expects ids+dists,
  ``util.h:98``).
- **RoarGraph projection index**: ``u32 ep, u32 nd``, then per node
  ``u32 deg, deg*u32 ids`` (``src/index_bipartite.cpp:2606-2619`` /
  ``LoadProjectionGraph:2097-2117``).
- **bipartite index**: ``u32 total_pts`` then per node ``u32 deg, deg*u32 ids``
  (``src/index_bipartite.cpp:2045-2071``).

All readers use numpy memory-mapped / bulk reads — no per-row Python loops.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

_DTYPE_SIZES = {np.dtype("float32"): 4, np.dtype("int32"): 4, np.dtype("uint32"): 4,
                np.dtype("uint8"): 1, np.dtype("int8"): 1}


def _read_header(path: str) -> Tuple[int, int]:
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype="<u4", count=2)
    if header.size != 2:
        raise ValueError(f"{path}: truncated header")
    return int(header[0]), int(header[1])


def load_meta(path: str, dtype=np.float32, expect_gt: bool = False) -> Tuple[int, int]:
    """Read and validate the (npts, dim) header (parity with ``util.h:106-127``
    and ``load_gt_meta``'s ids+dists double-payload check, ``util.h:84-103``)."""
    npts, dim = _read_header(path)
    fsize = os.path.getsize(path)
    itemsize = np.dtype(dtype).itemsize
    contained = (fsize - 8) // (dim * itemsize) if dim else 0
    expected = npts * 2 if expect_gt else npts
    if contained != expected:
        raise ValueError(
            f"{path}: data file size wrong! contains {contained} rows, "
            f"header says {expected}")
    return npts, dim


def load_fbin(path: str, dtype=np.float32, *, mmap: bool = False) -> np.ndarray:
    """Load an fbin/ibin file as ``[npts, dim]``. No dim padding — TPU-side
    padding happens at device placement, not in the file loader (the
    reference's 8-float alignment at ``util.h:189-199`` is an AVX artifact)."""
    npts, dim = load_meta(path, dtype)
    if mmap:
        arr = np.memmap(path, dtype=dtype, mode="r", offset=8, shape=(npts, dim))
        return arr
    with open(path, "rb") as f:
        f.seek(8)
        data = np.fromfile(f, dtype=dtype, count=npts * dim)
    return data.reshape(npts, dim)


def save_fbin(path: str, data: np.ndarray) -> None:
    data = np.ascontiguousarray(data)
    npts, dim = data.shape
    with open(path, "wb") as f:
        np.array([npts, dim], dtype="<u4").tofile(f)
        data.tofile(f)


def load_gt(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a groundtruth file → (ids ``[npts, K]`` u32, dists ``[npts, K]`` f32).

    Parity with ``util.h:129-155`` (``load_gt_data_with_dist``)."""
    npts, k = load_meta(path, np.uint32, expect_gt=True)
    with open(path, "rb") as f:
        f.seek(8)
        ids = np.fromfile(f, dtype="<u4", count=npts * k).reshape(npts, k)
        dists = np.fromfile(f, dtype="<f4", count=npts * k).reshape(npts, k)
    return ids, dists


def save_gt(path: str, ids: np.ndarray, dists: np.ndarray) -> None:
    """Write the DiskANN-compatible groundtruth format consumed by
    ``LoadLearnBaseKNN`` (``src/index_bipartite.cpp:2622-2642``)."""
    ids = np.ascontiguousarray(ids, dtype="<u4")
    dists = np.ascontiguousarray(dists, dtype="<f4")
    if ids.shape != dists.shape:
        raise ValueError("ids and dists must have matching shapes")
    npts, k = ids.shape
    with open(path, "wb") as f:
        np.array([npts, k], dtype="<u4").tofile(f)
        ids.tofile(f)
        dists.tofile(f)


def patch_npts(path: str, new_npts: int) -> None:
    """Overwrite the first u32 of a bin file (parity with
    ``change_meta_data_in_file.py``, used after dataset truncation)."""
    with open(path, "r+b") as f:
        np.array([new_npts], dtype="<u4").tofile(f)


# ---------------------------------------------------------------------------
# Reference index formats (variable-degree adjacency lists)
# ---------------------------------------------------------------------------

def save_projection_index(path: str, ep: int, neighbors: list) -> None:
    """``SaveProjectionGraph`` format: ``[u32 ep][u32 nd][deg, ids]*``
    (``src/index_bipartite.cpp:2606-2619``)."""
    nd = len(neighbors)
    chunks = [np.array([ep, nd], dtype="<u4")]
    for nbrs in neighbors:
        nbrs = np.asarray(nbrs, dtype="<u4")
        chunks.append(np.array([nbrs.size], dtype="<u4"))
        chunks.append(nbrs)
    with open(path, "wb") as f:
        np.concatenate(chunks).tofile(f)


def load_projection_index(path: str) -> Tuple[int, list]:
    """Inverse of :func:`save_projection_index`
    (``LoadProjectionGraph``, ``src/index_bipartite.cpp:2097-2117``)."""
    raw = np.fromfile(path, dtype="<u4")
    ep, nd = int(raw[0]), int(raw[1])
    neighbors = []
    pos = 2
    for _ in range(nd):
        deg = int(raw[pos]); pos += 1
        neighbors.append(raw[pos:pos + deg].copy()); pos += deg
    if pos != raw.size:
        raise ValueError(f"{path}: trailing bytes in projection index")
    return ep, neighbors


def load_nsg_index(path: str, npts: int = 1_000_000):
    """Read an NSG-format graph: ``u32 width, u32 ep`` then per node
    ``u32 deg, deg*u32 ids`` — the reference's ``LoadNsgGraph``
    (``src/index_bipartite.cpp:2073-2095``) with its hardcoded node count
    exposed as a parameter. Returns (ep, neighbor lists)."""
    raw = np.fromfile(path, dtype="<u4")
    ep = int(raw[1])  # raw[0] is the NSG 'width' field, unused like the ref
    neighbors = []
    pos = 2
    for _ in range(npts):
        deg = int(raw[pos]); pos += 1
        neighbors.append(raw[pos:pos + deg].copy()); pos += deg
    return ep, neighbors


def save_bipartite_index(path: str, neighbors: list) -> None:
    """``Save`` format for the bipartite baseline: ``[u32 total_pts][deg, ids]*``
    (``src/index_bipartite.cpp:2045-2056``). Node order: base nodes
    ``0..nd-1`` then query nodes ``nd..nd+nsq-1``."""
    total = len(neighbors)
    chunks = [np.array([total], dtype="<u4")]
    for nbrs in neighbors:
        nbrs = np.asarray(nbrs, dtype="<u4")
        chunks.append(np.array([nbrs.size], dtype="<u4"))
        chunks.append(nbrs)
    with open(path, "wb") as f:
        np.concatenate(chunks).tofile(f)


def load_bipartite_index(path: str) -> list:
    raw = np.fromfile(path, dtype="<u4")
    total = int(raw[0])
    neighbors = []
    pos = 1
    for _ in range(total):
        deg = int(raw[pos]); pos += 1
        neighbors.append(raw[pos:pos + deg].copy()); pos += deg
    if pos != raw.size:
        raise ValueError(f"{path}: trailing bytes in bipartite index")
    return neighbors
