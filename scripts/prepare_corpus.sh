#!/usr/bin/env bash
# Corpus-construction chain (reference scripts/prepare_{jtbc,moon,park}.sh):
#   clips -> silence split -> ASR -> script alignment -> .npz spectrograms
#
# Usage: scripts/prepare_corpus.sh <dataset_dir>
#   expects either <dataset_dir>/metadata.csv ("path|url|title|start|end"
#   rows for remote media, fetched via yt-dlp+ffmpeg) or raw long-form wavs
#   in <dataset_dir>/audio/, plus optionally <dataset_dir>/script.txt.
set -euo pipefail
DATASET_DIR=${1:?usage: prepare_corpus.sh <dataset_dir>}
cd "$(dirname "$0")/.."

if [ -f "$DATASET_DIR/metadata.csv" ] && grep -q '|http' "$DATASET_DIR/metadata.csv"; then
  python -m tacotron_tpu.tools.download clips "$DATASET_DIR/metadata.csv"
fi

# 1. split long recordings on silence into 3-8 s utterances
if ls "$DATASET_DIR"/audio/*.wav >/dev/null 2>&1; then
  python -m tacotron_tpu.tools.silence "$DATASET_DIR/audio/*.wav"
fi

# 2. ASR each utterance (requires google-cloud-speech; cached sidecars)
python -m tacotron_tpu.tools.asr "$DATASET_DIR/audio/*.*.wav" \
  --out_path "$DATASET_DIR/recognition.json"

# 3. align ASR against the source script (sentence list or whole book)
if [ -f "$DATASET_DIR/script.txt" ]; then
  python -m tacotron_tpu.tools.alignment \
    --recognition_path "$DATASET_DIR/recognition.json" \
    --script_path "$DATASET_DIR/script.txt" \
    --out_path "$DATASET_DIR/alignment.json"
elif [ -f "$DATASET_DIR/book.txt" ]; then
  python -m tacotron_tpu.tools.book_align \
    --recognition_path "$DATASET_DIR/recognition.json" \
    --book_path "$DATASET_DIR/book.txt" \
    --out_path "$DATASET_DIR/alignment.json"
fi

# 4. spectrogram .npz corpus
python -m tacotron_tpu.data.builder "$DATASET_DIR/alignment.json"

echo "[*] corpus ready: $DATASET_DIR/data"
