#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment1_voxel_size_100"
echo "Running $EXPERIMENT_NAME TRAIN"

# trainer.grad_accum_steps: fit the reference batch size in one
# 16 GB chip's HBM (see docs/ARCHITECTURE.md training-memory notes);
# drop or lower it on multi-chip dp meshes.
python -m mask3d_tpu.cli train \
    'trainer.grad_accum_steps=4' \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=structured3d' \
    'trainer.max_epochs=30' \
    'data.rasterization_factor=100' \
    'general.filter_out_instances=false' \
    'general.use_dbscan=false' \
    "$@"
