#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment2_voxel_size_150_extended"
echo "Running $EXPERIMENT_NAME EVAL (test split, no filtering)"

python -m mask3d_tpu.cli test \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=structured3d' \
    'data.test_dataset_mode=test' \
    'general.checkpoint=saved/experiment2_voxel_size_150_extended/run1/best_val_mean_ap.ckpt' \
    'data.rasterization_factor=150' \
    'general.filter_out_instances=false' \
    'general.use_dbscan=false' \
    'general.debug_best_worst_scenes=true' \
    'data.test_batch_size=1' \
    "$@"
