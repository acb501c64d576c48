#!/usr/bin/env bash
# North-star parity validation against a PUBLISHED reference checkpoint
# (BASELINE.md: mel/linear/waveform vs son/park) — one command, for an
# environment WITH network access (this build environment has none; the
# offline approximations are tests/test_tf_oracle.py + tests/ref_oracle.py).
#
#   scripts/validate_reference_bundle.sh [son|park] [WORKDIR]
#
# Steps:
#   1. fetch the published tarball (same Google-Drive ids as the
#      reference's download.py:82-88)
#   2. `compat report`  — expect ZERO unmatched / ZERO unfilled variables
#   3. `compat import`  — TF1 bundle -> run dir
#   4. synthesize a reference eval sentence from the imported weights and
#      save wav + alignment for listening / comparison against the
#      reference's published samples
set -euo pipefail
cd "$(dirname "$0")/.."

NAME="${1:-park}"
WORK="${2:-/tmp/ref_bundle_$NAME}"
mkdir -p "$WORK"

echo "== [1/4] fetch published '$NAME' checkpoint =="
python -m tacotron_tpu.tools.download checkpoint "$NAME" --out_dir "$WORK/ckpt"
PREFIX=$(find "$WORK/ckpt" -name 'model.ckpt-*.index' | sort -V | tail -1)
PREFIX="${PREFIX%.index}"
test -n "$PREFIX" || { echo "no model.ckpt-N found under $WORK/ckpt"; exit 1; }
echo "bundle: $PREFIX"

echo "== [2/4] name-mapping report (expect zero residue) =="
python -m tacotron_tpu.compat report "$PREFIX" | tee "$WORK/report.txt"
grep -q "unmatched source variables: 0" "$WORK/report.txt"

echo "== [3/4] import -> run dir =="
python -m tacotron_tpu.compat import "$PREFIX" --run_dir "$WORK/run"

echo "== [4/4] synthesis from the imported weights =="
python -m tacotron_tpu.synth --load_path "$WORK/run" \
  --sample_path "$WORK/synth" "오스트랄로피테쿠스 아파렌시스는 멸종된 사람족 종이다."
test -s "$WORK"/synth/synth_0.wav

echo "REFERENCE BUNDLE VALIDATION OK: $WORK"
echo "listen: $WORK/synth/synth_0.wav ; alignment: $WORK/synth/synth_0.png"
