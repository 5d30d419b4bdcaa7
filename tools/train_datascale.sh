#!/bin/bash
# Data-scale flagship training through the SHIPPED entry path (VERDICT r3
# item 3): experiment launch script -> `python -m mask3d_tpu.cli` ->
# trainer -> evaluator, on a 256-train / 32-val / 32-test synthetic
# Structured3D-format dataset (reference room-count mixture, BASELINE.md).
#
# Usage:
#   bash tools/train_datascale.sh [max_epochs]
#
# Generates the dataset on first run (tools/make_synthetic_dataset.py),
# pins ONE level-0 grid shape across the whole run (one train + one eval
# executable), then launches experiment1_voxel_size_150_train.sh with the
# HBM-fit overrides: micro-batch 1 x accum 16 — the data-scale mixture
# pins a (168,128,32) L0 grid, and micro-batch 2 OOMs the v5e at compile
# (23.95G vs 15.75G HBM, measured 2026-08-20).
# Auto-resumes from saved/…/r4_datascale/last-epoch.ckpt.
#
# Augmented training with ONE executable (VERDICT r4 item 3):
# `data.grid_dims_cap` pins the level-0 grid as floor AND ceiling — an
# augmented scene whose voxel bbox exceeds the pin (the stru3d preset's
# +-pi z-rotations / +-10% scales can inflate it) is center-cropped to
# fit by the collator instead of minting a new train executable (each
# novel shape was a ~45-min remote AOT compile through this tunnel; r4
# had to disable augmentation entirely). The pin equals the unaugmented
# per-axis max, so unrotated scenes are untouched and rotated near-max
# scenes lose only bbox corners.
set -e
cd "$(dirname "$0")/.."
ROOT=data/synth_stru3d
EPOCHS="${1:-100}"
RUN_ID="${RUN_ID:-r5_datascale}"

if [ ! -d "$ROOT/scene_00000" ]; then
    python tools/make_synthetic_dataset.py "$ROOT" 256 32 32 0
fi

# Pin the grid bucket: elementwise max of per-scene voxel dims, rounded up
# to the collator's multiple of 8 (same procedure as train_rehearsal.py).
GRID=$(python - "$ROOT" <<'EOF'
import sys, os
sys.path.insert(0, os.getcwd())
import numpy as np
from mask3d_tpu.data.ply import read_ply
from mask3d_tpu.data.collate import voxelize_item
root = sys.argv[1]
mx = np.zeros(3, np.int64)
for scene in sorted(os.listdir(root)):
    v = read_ply(os.path.join(root, scene, "point_cloud_rasterized_150.ply"))
    coords = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    _, _, dims = voxelize_item(coords)
    mx = np.maximum(mx, np.asarray(dims, np.int64))
print(",".join(str(int(-(-int(d) // 8) * 8)) for d in mx))
EOF
)
echo "pinned min_grid_dims=[$GRID]"

# Supervisor loop (VERDICT r4 "what's weak" 6): bench.py preempts the
# trainer (SIGTERM via /tmp/rehearsal.pid) whenever the driver measures;
# auto-resume replays at most the interrupted epoch, but someone must
# relaunch. Retry until the trainer exits cleanly (reached max_epochs)
# or fails MAX_RETRIES times in a row within a minute (a real error, not
# a preemption).
MAX_RETRIES=200
tries=0
while true; do
    start=$(date +%s)
    set +e
    bash experiment_launch_scripts/experiment1_voxel_size_150_train.sh \
        data.data_root="$ROOT" \
        'data.valid_scenes_file_path=null' \
        "data.grid_dims_cap=[$GRID]" \
        'data.point_bucket_multiple=65536' \
        'trainer.grad_accum_steps=16' \
        'data.test_batch_size=4' \
        'data.volume_augmentations=stru3d' \
        'model.remat_backbone=true' \
        'optimizer.lr=0.0003' \
        "trainer.max_epochs=$EPOCHS" \
        'trainer.check_val_every_n_epoch=5' \
        'trainer.save_last_every_n_epochs=2' \
        'trainer.log_every_n_steps=16' \
        'trainer.train_split_metrics=false' \
        'general.use_dbscan=false' \
        'general.scores_threshold=0.0' \
        'general.export_las=false' \
        "general.experiment_id=$RUN_ID"
    rc=$?
    set -e
    [ "$rc" -eq 0 ] && { echo "datascale: training complete"; break; }
    end=$(date +%s)
    if [ $((end - start)) -lt 60 ]; then
        tries=$((tries + 1))
        [ "$tries" -ge "$MAX_RETRIES" ] && {
            echo "datascale: $MAX_RETRIES fast failures — giving up"; exit 1; }
    else
        tries=0
    fi
    echo "datascale: trainer exited rc=$rc (preempted?) — relaunching in 90s"
    sleep 90
    # Cooperative pause: a TPU-measurement session (bench.py reps, kernel
    # microbenches) touches /tmp/tpu_pause while it owns the tunnel; the
    # supervisor waits instead of racing it (ONE TPU process at a time).
    while [ -e /tmp/tpu_pause ]; do
        echo "datascale: /tmp/tpu_pause present — waiting 60s"
        sleep 60
    done
done
