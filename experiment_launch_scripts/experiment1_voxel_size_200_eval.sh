#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment1_voxel_size_200"
echo "Running $EXPERIMENT_NAME TEST"

python -m mask3d_tpu.cli test \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=structured3d' \
    'data.rasterization_factor=200' \
    'general.checkpoint=saved/experiment1_voxel_size_200/run1/last-epoch.ckpt' \
    'general.filter_out_instances=false' \
    'general.use_dbscan=false' \
    'data.test_batch_size=1' \
    "$@"
