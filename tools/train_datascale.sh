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
# volume_augmentations=none: the stru3d preset's +-pi z-rotations (and
# +-10% scales) enlarge a scene's voxel bbox past ANY unaugmented pin, so
# each novel overflow shape forces a fresh train_step executable — a
# ~45-min remote AOT compile per shape on this tunnel (measured: epoch 0
# compiled once and stepped in ~2 min; epoch 1 hit a rotated-overflow
# shape and sat in compile). One pinned shape = one compile for the whole
# run. The augs stay implemented/tested (data/augment.py); at this run's
# data scale (256 scenes, <=100 epochs) augmentation is not the binding
# factor for the mAP target.
set -e
cd "$(dirname "$0")/.."
ROOT=data/synth_stru3d
EPOCHS="${1:-100}"

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

exec bash experiment_launch_scripts/experiment1_voxel_size_150_train.sh \
    data.data_root="$ROOT" \
    'data.valid_scenes_file_path=null' \
    "data.min_grid_dims=[$GRID]" \
    'data.point_bucket_multiple=65536' \
    'trainer.grad_accum_steps=16' \
    'data.volume_augmentations=none' \
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
    'general.experiment_id=r4_datascale'
