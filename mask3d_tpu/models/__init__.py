"""Model zoo: sparse-UNet backbones and the Mask3D masked-transformer decoder.

TPU-native re-design of the reference model layer (`mask3d/models/`):
- `backbone` — Res16UNet family (reference `mask3d/models/res16unet.py`)
- `mask3d`   — query decoder + mask module (reference `mask3d/models/mask3d.py`)
- `posenc`   — Fourier/sine positional encodings
  (reference `mask3d/models/position_embedding.py`)
"""

from mask3d_tpu.models.backbone import (  # noqa: F401
    BACKBONES,
    Res16UNet14,
    Res16UNet18,
    Res16UNet34,
    Res16UNet34A,
    Res16UNet34B,
    Res16UNet34C,
    Res16UNet34D,
)
from mask3d_tpu.models.mask3d import Mask3D, Mask3DOutput  # noqa: F401
