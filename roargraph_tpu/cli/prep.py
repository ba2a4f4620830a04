"""Dataset-prep CLI — the L7 tooling surface (SURVEY.md §2.4).

Subcommand front-end over :mod:`roargraph_tpu.data.prep`, covering the
reference's three standalone prep scripts:

- ``export-npy``   — concatenate npy embedding shards into an fbin
  (parity with ``export_fbin_from_npy.py:1-42``; laion-10M).
- ``webvid-pool``  — per-video mean of row-normalized CLIP frame
  embeddings, re-normalized, written as an fbin (parity with
  ``prepare_for_clip_webvid.py``'s transform; input is an .npz of
  per-video [frames, 512] arrays or a directory of .npy files).
- ``patch-npts``   — rewrite an fbin's npts header
  (parity with ``change_meta_data_in_file.py:1-16``).
- ``truncate``     — keep the first n rows + patch the header (the
  reference does dd + patch, ``prepare_data.sh:28-37``).
- ``info``         — print an fbin/ibin header (npts, dim, bytes).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..data import prep


def main(argv=None):
    p = argparse.ArgumentParser(prog="roargraph-prep", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("export-npy", help="concat npy shards -> fbin")
    s.add_argument("npy", nargs="+", help="npy shard paths, in order")
    s.add_argument("--out", required=True)

    s = sub.add_parser("webvid-pool",
                       help="mean-pool per-video CLIP frames -> fbin")
    s.add_argument("src", help=".npz of per-video arrays, or a directory "
                               "of per-video .npy files")
    s.add_argument("--out", required=True)
    s.add_argument("--dim", type=int, default=512)

    s = sub.add_parser("patch-npts", help="rewrite fbin npts header")
    s.add_argument("path")
    s.add_argument("--npts", type=int, required=True)

    s = sub.add_parser("truncate", help="keep first n rows, patch header")
    s.add_argument("path")
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--itemsize", type=int, default=4,
                   help="bytes per element (4 = f32/i32)")

    s = sub.add_parser("info", help="print fbin/ibin header")
    s.add_argument("path")

    args = p.parse_args(argv)

    if args.cmd == "export-npy":
        prep.export_fbin_from_npy(args.npy, args.out)
        npts, dim = _header(args.out)
        print(f"{args.out}: npts={npts} dim={dim}")
    elif args.cmd == "webvid-pool":
        if os.path.isdir(args.src):
            files = sorted(os.listdir(args.src))
            videos = (np.load(os.path.join(args.src, f)) for f in files
                      if f.endswith(".npy"))
        else:
            z = np.load(args.src)
            videos = (z[k] for k in sorted(z.files))
        n = prep.webvid_build_fbin(videos, args.out, dim=args.dim)
        print(f"{args.out}: {n} videos pooled")
    elif args.cmd == "patch-npts":
        prep.patch_fbin_npts(args.path, args.npts)
        print(f"{args.path}: npts={args.npts}")
    elif args.cmd == "truncate":
        itemsize = args.itemsize
        dt = np.float32 if itemsize == 4 else np.dtype(f"V{itemsize}")
        prep.truncate_fbin(args.path, args.rows, dtype=dt)
        print(f"{args.path}: truncated to {args.rows} rows")
    elif args.cmd == "info":
        npts, dim = _header(args.path)
        sz = os.path.getsize(args.path)
        print(f"{args.path}: npts={npts} dim={dim} bytes={sz}")
    return 0


def _header(path):
    with open(path, "rb") as f:
        npts, dim = np.fromfile(f, dtype=np.uint32, count=2)
    return int(npts), int(dim)


if __name__ == "__main__":
    sys.exit(main())
