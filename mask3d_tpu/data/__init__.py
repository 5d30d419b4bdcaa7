"""Data layer: datasets, voxelizing collation, augmentation, synthetic scenes.

Rebuild of the reference data layer (`mask3d/datasets/`): three dataset
readers (Structured3D / S3DIS / Matterport3D), the voxelize-collate function
(`mask3d/datasets/utils.py:11-146`), per-instance target construction
(`utils.py:286-329`), and volumentations-equivalent augmentations — all
producing static-shape padded batches for the TPU path.
"""

from mask3d_tpu.data.batch import DeviceBatch, HostBatch, Targets  # noqa: F401
from mask3d_tpu.data.collate import VoxelizeCollate  # noqa: F401
from mask3d_tpu.data.synthetic import make_synthetic_scene  # noqa: F401
from mask3d_tpu.data.transfer import (  # noqa: F401
    decode_keys_u8,
    encode_keys_u8,
)
