#!/bin/bash
# Round-5 mid-run TPU measurement window (pauses the datascale
# supervisor cooperatively, runs the queued device experiments, then
# resumes training):
#   1. bench.py with model.fold_small_stages=true (the z-folded stage-1
#      chain) vs the 3.69M baseline config
#   2. tools/bench_large_scene.py — bricked vs gather paths A/B
# Usage: bash tools/r5_window.sh 2>&1 | tee /tmp/r5_window.log
set -e
cd "$(dirname "$0")/.."

touch /tmp/tpu_pause
# wait for the trainer to be preempted by bench.py's own pid protocol
# (bench.py SIGTERMs /tmp/rehearsal.pid holders and waits)

echo "=== [1/2] bench.py + fold_small_stages ==="
MASK3D_BENCH_OVERRIDES="model.fold_small_stages=true" \
    timeout 1800 python bench.py 8 2>&1 | grep "^#\|^{" || true

echo "=== [2/2] large-scene bricked A/B ==="
timeout 3600 python tools/bench_large_scene.py 2>&1 \
    | grep -v "WARNING\|oneDNN\|cudart\|I0000" || true

rm -f /tmp/tpu_pause
echo "window done — supervisor resumes within 60s"
