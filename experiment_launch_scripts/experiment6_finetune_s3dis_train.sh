#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment6_finetune_s3dis"
echo "Running $EXPERIMENT_NAME TRAIN"

# trainer.grad_accum_steps: fit the reference batch size in one
# 16 GB chip's HBM (see docs/ARCHITECTURE.md training-memory notes);
# drop or lower it on multi-chip dp meshes.
python -m mask3d_tpu.cli train \
    'trainer.grad_accum_steps=4' \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=s3dis' \
    'model.num_queries=100' \
    'general.checkpoint=saved/experiment2_voxel_size_150_extended/run1/best_val_mean_ap.ckpt' \
    'trainer.max_epochs=350' \
    'data.rasterization_factor=150' \
    'general.filter_out_instances=true' \
    'general.use_dbscan=false' \
    "$@"
