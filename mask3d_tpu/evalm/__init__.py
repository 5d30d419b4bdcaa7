"""Instance-segmentation metrics.

Rebuild of the reference evaluator
(`mask3d/benchmark/evaluate_semantic_instance.py:17-606`): ScanNet-style mAP
over IoU thresholds {0.5..0.9 step 0.05} (+0.25 reported separately), plus
the work's custom metrics — precision/recall/F1 @ IoU 0.5, mean matched IoU,
and SDR (successfully-detected-rooms @ IoU 0.75).
"""

from mask3d_tpu.evalm.evaluator import Mask3DEvaluator  # noqa: F401
from mask3d_tpu.evalm.pointwise import (  # noqa: F401
    pointwise_from_maskwise_gt,
    pointwise_from_maskwise_preds,
)
