#!/usr/bin/env bash
# Canonical search sweep: k=10, L_pq 10..2000
# (mirror of the reference's run_roargraph_search_test.sh).
set -euo pipefail
PREFIX=${PREFIX:-data/t2i-10M}
python -m roargraph_tpu.cli.search \
  --data_type float --dist ip \
  --base_data_path "$PREFIX/base.10M.fbin" \
  --query_path "$PREFIX/query.public.100K.fbin" \
  --gt_path "$PREFIX/gt.public.100K.ibin" \
  --projection_index_save_path "$PREFIX/t2i_10M_roar.index" \
  --k 10 -T 16 \
  --L_pq 10 15 20 25 30 35 40 45 50 55 60 65 70 75 80 85 90 95 100 110 120 \
         130 140 150 160 170 180 190 200 220 240 260 280 300 350 400 450 \
         500 550 600 650 700 750 800 900 1000 1100 1200 1300 1400 1500 \
         1600 1700 1800 1900 2000 \
  --evaluation_save_path eval_roargraph.csv
