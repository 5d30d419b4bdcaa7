"""Model zoo: sparse-UNet backbones and the Mask3D masked-transformer decoder.

TPU-native re-design of the reference model layer (`mask3d/models/`):
- `backbone` — Res16UNet family (reference `mask3d/models/res16unet.py`)
- `resunet`  — MinkUNet/ResUNet alternative family incl. SE variants
  (reference `mask3d/models/resunet.py`, `modules/senet_block.py`)
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
from mask3d_tpu.models.resunet import (  # noqa: F401
    RESUNETS,
    MinkUNetBase,
    ResUNet14,
    ResUNet18,
    ResUNet34,
    ResUNet50,
    ResUNet101,
)

#: Name -> class registry over the full zoo
#: (reference `mask3d/models/__init__.py:14-31` `MODELS`/`add_models`).
MODELS = dict(BACKBONES)
MODELS.update(RESUNETS)


def load_model(name):
    """Class lookup by name (`mask3d/models/__init__.py:34-44`): returns the
    model class, or None after printing the valid options."""
    if name not in MODELS:
        print("Invalid model index. Options are:")
        for key in MODELS:
            print(f"\t* {key}")
        return None
    return MODELS[name]


def get_models():
    """Tuple of all registered model classes
    (`mask3d/models/__init__.py:26-28`)."""
    return tuple(MODELS.values())
