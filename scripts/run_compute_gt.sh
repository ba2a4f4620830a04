#!/usr/bin/env bash
# Training-query groundtruth on the accelerator
# (replaces the reference's external DiskANN compute_groundtruth step).
set -euo pipefail
PREFIX=${PREFIX:-data/t2i-10M}
python -m roargraph_tpu.cli.gt --dist ip \
  --base_file "$PREFIX/base.10M.fbin" \
  --query_file "$PREFIX/query.train.10M.fbin" \
  --gt_file "$PREFIX/train.gt.bin" --K 100
