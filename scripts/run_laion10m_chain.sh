#!/bin/bash
# laion-10M-shaped protocol: 10M base, 512-d, unit-normalized CLIP-style
# embeddings under IP (the reference's laion convention: `export_fbin_from_npy.py`
# embeddings are pre-normalized, searched with --dist ip — README.md:41-44,92).
# Same sharded chain as t2i-10M (build_10m.py / serve_10m.py), tag laion10m.
#
# Wall-clock estimate from the t2i-10M run scaled by D (512/200 = 2.56x on
# the matmul stages): ~10-13 h on one tunneled v5e chip incl. crash-retries.
# Every stage is cached/checkpointed under build/, so the chain can be
# stopped and resumed freely. Start it FIRST thing in a round.
set -u
cd "$(dirname "$0")/.."
export B10M_TAG=laion10m B10M_D=512 B10M_NORM=1
export B10M_N="${LAION_N:-10000000}" B10M_TRAIN="${LAION_TRAIN:-1250000}"
export B10M_SHARDS="${LAION_SHARDS:-8}"
# C=512 tiles won the t2i-10M arm race (eval_t2i10m_tiles_c512.json);
# at 512-d the tile bytes double, so keep C=512 (not 1024) for HBM headroom.
export SERVE_TILE_C="${SERVE_TILE_C:-512}"
export SERVE_T="${SERVE_T:-192,384,768}" SERVE_T_MAX="${SERVE_T_MAX:-1536}"
export SERVE_NO_ME=1 SERVE_NO_EE=1 SERVE_NO_FUSED=1
exec bash scripts/run_10m_chain.sh
