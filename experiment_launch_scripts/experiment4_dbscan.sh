#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment4_dbscan"
echo "Running $EXPERIMENT_NAME TEST"

python -m mask3d_tpu.cli test \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=structured3d' \
    'data.rasterization_factor=150' \
    'general.checkpoint=saved/experiment2_voxel_size_150_extended/run1/best_val_mean_ap.ckpt' \
    'general.filter_out_instances=true' \
    'general.use_dbscan=true' \
    'general.dbscan_eps=1' \
    'general.dbscan_min_points=10' \
    'data.test_batch_size=1' \
    "$@"
