#!/bin/bash
# TPU-native equivalent of the reference launch script of the same name
# (reference: mask3d/experiment_launch_scripts/). Override grammar is
# identical; the entry point is `python -m mask3d_tpu.cli`.
EXPERIMENT_NAME="experiment7_finetune_matterport3d"
echo "Running $EXPERIMENT_NAME TEST"

python -m mask3d_tpu.cli test \
    general.experiment_name="$EXPERIMENT_NAME" \
    'data.dataset=matterport3d' \
    'model.num_queries=100' \
    'general.checkpoint=saved/experiment7_finetune_matterport3d/run1/best_val_mean_ap.ckpt' \
    'data.rasterization_factor=150' \
    'general.filter_out_instances=true' \
    'general.use_dbscan=false' \
    'data.test_batch_size=1' \
    "$@"
