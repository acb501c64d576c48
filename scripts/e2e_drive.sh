#!/usr/bin/env bash
# Full product-surface drive on real hardware, one command:
#   corpus -> npz builder -> train.py (converges, checkpoints, metrics,
#   TB events) -> CLI synthesis from the checkpoint -> HTTP /generate.
#
# The TPU-chip analog of actually using the reference end to end
# (prepare -> train -> synthesizer.py -> app.py).  ~8 minutes on a
# TPU v5 lite with a warm compilation cache.
#
# Usage: scripts/e2e_drive.sh [WORKDIR]   (default /tmp/tacotron_e2e)
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${1:-/tmp/tacotron_e2e}"
PORT="${E2E_PORT:-5571}"
STEPS="${E2E_STEPS:-90}"

echo "== [1/5] synthetic 2-speaker corpus =="
python scripts/make_synthetic_corpus.py "$WORK/corpus" --store_waveform

echo "== [2/5] offline npz builder =="
for spk in 0 1; do
  python -m tacotron_tpu.data.builder "$WORK/corpus/spk$spk/metadata.csv" \
    --config "$WORK/corpus/config.json" --num_workers 2
done

echo "== [3/5] train.py ($STEPS steps, deepvoice 2-speaker, TPU preset) =="
python train.py \
  --data_paths="$WORK/corpus/spk0/data,$WORK/corpus/spk1/data" \
  --config="$WORK/corpus/config.json" --model_type=deepvoice \
  --preset=tpu --batch_size=8 \
  --num_steps="$STEPS" --log_dir="$WORK/logs" --prewarm
RUN_DIR=$(ls -dt "$WORK"/logs/*/ | head -1)
echo "run dir: $RUN_DIR"
test -f "$RUN_DIR/metrics.jsonl"
ls "$RUN_DIR"/checkpoints >/dev/null

echo "== [4/5] CLI synthesis from the checkpoint =="
python -m tacotron_tpu.synth --load_path "$RUN_DIR" --speaker_id 1 \
  --sample_path "$WORK/synth" "안녕하세요 만나서 반갑습니다"
test -s "$WORK"/synth/synth_0.wav

echo "== [5/5] HTTP serving =="
python app.py --load_path "$RUN_DIR" --port "$PORT" >"$WORK/app.log" 2>&1 &
APP_PID=$!
trap 'kill "$APP_PID" 2>/dev/null || true' EXIT
for _ in $(seq 60); do
  sleep 2
  CODE=$(curl -s -o "$WORK/gen.wav" -w '%{http_code}' \
    "http://127.0.0.1:$PORT/generate?text=%EC%95%88%EB%85%95&speaker_id=0" \
    || true)
  [ "$CODE" = 200 ] && break
done
[ "$CODE" = 200 ] || { echo "HTTP /generate failed ($CODE)"; exit 1; }
test -s "$WORK/gen.wav"

echo "E2E DRIVE OK: $RUN_DIR"
