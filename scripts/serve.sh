#!/usr/bin/env bash
# Launch the HTTP synthesis demo for one or more trained runs
# (reference run.sh launched one app per model on consecutive ports).
set -euo pipefail
cd "$(dirname "$0")/.."
PORT=${PORT:-5100}
for RUN_DIR in "$@"; do
  echo "[*] serving $RUN_DIR on port $PORT"
  python app.py --load_path "$RUN_DIR" --port "$PORT" &
  PORT=$((PORT + 1))
done
wait
