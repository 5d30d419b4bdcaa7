"""Utility subsystems: runtime metering, checkpoint key-matching, export."""

from mask3d_tpu.utils import meter  # noqa: F401
