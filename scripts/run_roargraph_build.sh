#!/usr/bin/env bash
# Canonical build invocation with the paper parameters
# (mirror of the reference's run_roargraph_test.sh).
set -euo pipefail
PREFIX=${PREFIX:-data/t2i-10M}
python -m roargraph_tpu.cli.build \
  --data_type float --dist ip \
  --base_data_path "$PREFIX/base.10M.fbin" \
  --sampled_query_data_path "$PREFIX/query.train.10M.fbin" \
  --learn_base_nn_path "$PREFIX/train.gt.bin" \
  --projection_index_save_path "$PREFIX/t2i_10M_roar.index" \
  --M_sq 100 --M_pjbp 35 --L_pjpq 500 -T 64
