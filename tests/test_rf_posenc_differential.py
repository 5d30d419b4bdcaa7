"""Differential validation of the RoomFormer 2D sine position embedding
against the reference `models/position_encoding.py` (normalize=True, no
padding mask — the density-map inputs are full frames)."""

import sys
import types

import numpy as np
import pytest

from mask3d_tpu.baseline.roomformer import sine_position_2d

REF_DIR = "/root/reference/RoomFormer"


@pytest.fixture(scope="module")
def ref_pe():
    torch = pytest.importorskip("torch")  # noqa: F841
    saved = {k: sys.modules.get(k)
             for k in ("models", "models.position_encoding", "util",
                       "util.misc")}
    for k in saved:
        sys.modules.pop(k, None)
    pkg = types.ModuleType("models")
    pkg.__path__ = [f"{REF_DIR}/models"]
    sys.modules["models"] = pkg
    # util.misc pulls torchvision; the PE only needs the NestedTensor name.
    util_pkg = types.ModuleType("util")
    util_pkg.__path__ = [f"{REF_DIR}/util"]
    misc = types.ModuleType("util.misc")
    misc.NestedTensor = type("NestedTensor", (), {})
    sys.modules["util"] = util_pkg
    sys.modules["util.misc"] = misc
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        yield importlib.import_module("models.position_encoding")
    finally:
        sys.path.remove(REF_DIR)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_rf_sine_position_differential(ref_pe):
    import torch

    for h, w, dim in [(64, 64, 256), (32, 48, 256), (16, 16, 128)]:
        mod = ref_pe.PositionEmbeddingSine(
            num_pos_feats=dim // 2, normalize=True
        )
        duck = types.SimpleNamespace(
            tensors=torch.zeros(1, 3, h, w),
            mask=torch.zeros(1, h, w, dtype=torch.bool),
        )
        ref = mod.forward(duck).permute(0, 2, 3, 1)[0].numpy()  # [H, W, D]
        ours = np.asarray(sine_position_2d(h, w, dim))
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"{h}x{w}x{dim}")
