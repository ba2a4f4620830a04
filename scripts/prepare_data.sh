#!/bin/bash
# Dataset preparation driver — the reference's prepare_data.sh equivalent
# (SURVEY.md §2.4), built on the in-framework prep CLI
# (python -m roargraph_tpu.cli.prep). This environment has no network
# egress, so downloads are GATED: if the raw artifacts are already present
# under $DATA_ROOT the script runs the transforms; otherwise it prints
# where to fetch them and exits.
#
# Usage: scripts/prepare_data.sh {t2i-10M|laion-10M|webvid-2.5M} [DATA_ROOT]
#
# Expected raw artifacts per dataset (place them under DATA_ROOT/<name>/raw):
#   t2i-10M      base.1B.fbin slice (or base.10M.fbin directly) and
#                query.learn.50M.fbin from the Yandex Text-to-Image-1B
#                release (big-ann-benchmarks); 200-d f32, IP.
#   laion-10M    img_emb_*.npy / text_emb_*.npy CLIP shards from the
#                LAION-400M embedding release; 512-d, normalized, IP.
#   webvid-2.5M  per-video CLIP frame-embedding .npy files (or one .npz)
#                from the CLIP-WebVid release; pooled to 512-d.
set -eu
DS="${1:?dataset name}"
ROOT="${2:-data}"
RAW="$ROOT/$DS/raw"
OUT="$ROOT/$DS"
PREP="python -m roargraph_tpu.cli.prep"
mkdir -p "$OUT"

missing() {
  echo "missing raw artifacts for $DS under $RAW"
  echo "this environment has no network egress; fetch the files listed in"
  echo "the header comment on a connected machine and re-run."
  exit 2
}

case "$DS" in
  t2i-10M)
    [ -d "$RAW" ] || missing
    if [ -f "$RAW/base.10M.fbin" ]; then
      cp -n "$RAW/base.10M.fbin" "$OUT/base.10M.fbin"
    elif [ -f "$RAW/base.1B.fbin.part" ]; then
      # a range-request slice of the 1B base: first 10M rows + header patch
      cp "$RAW/base.1B.fbin.part" "$OUT/base.10M.fbin"
      $PREP truncate "$OUT/base.10M.fbin" --rows 10000000
    else
      missing
    fi
    cp -n "$RAW/query.train.10M.fbin" "$OUT/query.train.10M.fbin" \
      2>/dev/null || {
      [ -f "$RAW/query.learn.50M.fbin" ] || missing
      cp "$RAW/query.learn.50M.fbin" "$OUT/query.train.10M.fbin"
      $PREP truncate "$OUT/query.train.10M.fbin" --rows 10000000
    }
    ;;
  laion-10M)
    [ -d "$RAW" ] || missing
    img=$(ls "$RAW"/img_emb_*.npy 2>/dev/null | sort | head -40) || true
    txt=$(ls "$RAW"/text_emb_*.npy 2>/dev/null | sort | head -40) || true
    [ -n "$img" ] && [ -n "$txt" ] || missing
    # shellcheck disable=SC2086
    $PREP export-npy $img --out "$OUT/base.10M.fbin"
    $PREP truncate "$OUT/base.10M.fbin" --rows 10000000
    # shellcheck disable=SC2086
    $PREP export-npy $txt --out "$OUT/query.train.10M.fbin"
    $PREP truncate "$OUT/query.train.10M.fbin" --rows 10000000
    ;;
  webvid-2.5M)
    [ -d "$RAW" ] || missing
    $PREP webvid-pool "$RAW" --out "$OUT/base.2.5M.fbin" --dim 512
    ;;
  *)
    echo "unknown dataset $DS (t2i-10M | laion-10M | webvid-2.5M)"; exit 2 ;;
esac

$PREP info "$OUT"/*.fbin
echo "prepared $DS under $OUT; next: roargraph-gt / roargraph-build"
