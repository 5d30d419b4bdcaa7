"""Baseline comparison stack (reference `RoomFormer/` subproject, L7).

Provides the apples-to-apples evaluation bridge the reference uses to score
the RoomFormer floorplan baseline with the Mask3D evaluator
(`RoomFormer/mask3d_evaluator/roomformer_to_mask3d.py`), plus the 2D
density-map projection its data pipeline is built on.
"""

from mask3d_tpu.baseline.roomformer_bridge import (  # noqa: F401
    density_normalization,
    points_to_density_map,
    polygons_to_mask3d_prediction,
)
from mask3d_tpu.baseline.roomformer import (  # noqa: F401
    RoomFormer,
    RoomFormerOutput,
)
from mask3d_tpu.baseline.criterion2d import RoomFormerCriterion  # noqa: F401
from mask3d_tpu.baseline.floorplan_eval import (  # noqa: F401
    FloorplanEvaluator,
    SceneCADEvaluator,
)
