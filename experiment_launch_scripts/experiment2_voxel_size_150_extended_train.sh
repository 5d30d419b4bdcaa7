#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment2_voxel_size_150_extended"
echo "Running $EXPERIMENT_NAME TRAIN"

# trainer.grad_accum_steps: fit the reference batch size in one
# 16 GB chip's HBM (see docs/ARCHITECTURE.md training-memory notes);
# drop or lower it on multi-chip dp meshes.
python -m mask3d_tpu.cli train \
    'trainer.grad_accum_steps=4' \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=structured3d' \
    'trainer.max_epochs=380' \
    'data.rasterization_factor=150' \
    'general.checkpoint=saved/experiment1_voxel_size_150/run1/last-epoch.ckpt' \
    'general.filter_out_instances=false' \
    'general.use_dbscan=false' \
    "$@"
