"""Standalone numeric ops: FPS, LSAP (Hungarian) matching, DBSCAN.

TPU-native replacements for the reference's native kernels and SciPy/sklearn
dependencies (SURVEY.md §2.2 N2/N5/N6):
- `fps`    — furthest-point sampling (replaces pointnet2 `_ext` CUDA,
             `mask3d/third_party/pointnet2/_ext_src/src/sampling_gpu.cu`)
- `lsap`   — linear sum assignment on device (replaces
             `scipy.optimize.linear_sum_assignment`, `mask3d/models/matcher.py:170`)
- `dbscan` — host-side density clustering (replaces sklearn DBSCAN,
             `mask3d/trainer/trainer.py:75`)
- `segment` — segment mean/max/min (replaces torch-scatter,
             `mask3d/models/mask3d.py:138-143`)
- `point_attention` — edge-list point-transformer attention / RPE ops
             (replaces the vendored pointops2 CUDA kernels, SURVEY.md N3,
             `mask3d/utils/pointops2/functions/pointops.py`)
"""

from mask3d_tpu.ops.fps import furthest_point_sample  # noqa: F401
from mask3d_tpu.ops.lsap import linear_sum_assignment  # noqa: F401
from mask3d_tpu.ops.segment import (  # noqa: F401
    batched_segment_reduce,
    segment_max,
    segment_mean,
    segment_min,
)
from mask3d_tpu.ops.point_attention import (  # noqa: F401
    aggregation,
    attention_step1,
    attention_step2,
    attention_step2_with_rel_pos_value,
    dot_prod_with_idx,
)
