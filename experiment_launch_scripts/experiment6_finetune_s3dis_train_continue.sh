#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment6_finetune_s3dis"
echo "Running $EXPERIMENT_NAME TRAIN"

python -m mask3d_tpu.cli train \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=s3dis' \
    'model.num_queries=100' \
    'trainer.max_epochs=700' \
    'data.rasterization_factor=150' \
    'general.filter_out_instances=true' \
    'general.use_dbscan=false' \
    "$@"
