#!/bin/bash
# Re-certify the numeric-format stack on the FLAGSHIP model (VERDICT r4
# item 4): run the SHIPPED test entry (`python -m mask3d_tpu.cli test`,
# the reference experiment5 eval protocol —
# /root/reference/mask3d/experiment_launch_scripts/experiment5_test_split_eval_structured3d.sh)
# on the data-scale checkpoint with Res16UNet34C at data-scale scenes,
# under bench.py's own numeric overrides, and gate each variant's val
# mAP/mAP50/mAP25 within 0.01 of the fp32 run. Closes the 18A-proxy gap
# (tests/test_e2e.py certifies an 18A model on small scenes; this
# certifies the shipped bench config on the flagship checkpoint).
#
# Usage (real chip; pauses the datascale supervisor via /tmp/tpu_pause):
#   touch /tmp/tpu_pause
#   bash tools/recert_int8.sh [checkpoint] | tee /tmp/recert.log
#   rm /tmp/tpu_pause
set -e
cd "$(dirname "$0")/.."
RUN=saved/experiment1_voxel_size_150/r5_datascale
CKPT="${1:-$RUN/best_val_mean_ap_50.ckpt}"
ROOT=data/synth_stru3d
[ -f "$CKPT" ] || { echo "no checkpoint at $CKPT"; exit 1; }

# One pinned executable across variants: same grid pin as the training
# launcher (tools/train_datascale.sh derives it identically).
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

COMMON=(
    data.data_root="$ROOT"
    'data.valid_scenes_file_path=null'
    "data.min_grid_dims=[$GRID]"
    'data.point_bucket_multiple=65536'
    'data.test_batch_size=4'
    'general.use_dbscan=false'
    'general.scores_threshold=0.0'
    'general.export_las=false'
    "general.checkpoint=$CKPT"
    'general.experiment_id=recert_scratch'
)

run_variant() {
    local name="$1"; shift
    echo "=== variant: $name ==="
    python -m mask3d_tpu.cli test "${COMMON[@]}" "$@" 2>&1 \
        | grep -E "^(val_|test_)" | sed "s/^/$name /"
}

run_variant fp32 | tee /tmp/recert_fp32.txt
run_variant bf16 'model.compute_dtype=bfloat16' | tee /tmp/recert_bf16.txt
# bench.py's shipped numeric stack
run_variant int8 'model.compute_dtype=bfloat16' 'model.int8_stride1=true' \
    'model.int8_act_sigma=10' 'model.int8_residual=true' \
    'model.unit_features=true' | tee /tmp/recert_int8.txt

python - <<'EOF'
import re
def read(name):
    vals = {}
    for line in open(f"/tmp/recert_{name}.txt"):
        parts = line.split()
        if len(parts) == 3 and parts[1].rstrip(":").endswith(
                ("mean_ap", "mean_ap_50", "mean_ap_25")):
            vals[parts[1].rstrip(":")] = float(parts[2])
    return vals
ref = read("fp32")
ok = True
for name in ("bf16", "int8"):
    got = read(name)
    for k, v in ref.items():
        d = abs(got.get(k, float("nan")) - v)
        flag = "OK" if d <= 0.01 else "FAIL"
        ok &= d <= 0.01
        print(f"{name} {k}: {got.get(k):.4f} vs fp32 {v:.4f} "
              f"(|d|={d:.4f}) {flag}")
print("RECERT", "PASS" if ok else "FAIL")
raise SystemExit(0 if ok else 1)
EOF
