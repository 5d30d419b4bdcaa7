"""Differential validation of the positional encodings.

Imports the REFERENCE `models/position_embedding.py` (torch-only) and
compares both pos_types against `mask3d_tpu/models/posenc.py` on fuzzed
coordinates with per-item input ranges, sharing the gauss_B buffer.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from mask3d_tpu.models.posenc import fourier_embeddings, sine_embeddings

REF = "/root/reference/mask3d"


@pytest.fixture(scope="module")
def ref_posenc():
    torch = pytest.importorskip("torch")  # noqa: F841
    saved = {k: sys.modules.get(k) for k in ("models",
                                             "models.position_embedding")}
    for k in saved:
        sys.modules.pop(k, None)
    pkg = types.ModuleType("models")
    pkg.__path__ = [f"{REF}/models"]
    sys.modules["models"] = pkg
    sys.path.insert(0, REF)
    try:
        import importlib

        yield importlib.import_module("models.position_embedding")
    finally:
        sys.path.remove(REF)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_fourier_posenc_differential(ref_posenc):
    import torch

    rng = np.random.default_rng(20260824)
    d_pos = 128
    for trial in range(10):
        b, n = int(rng.integers(1, 4)), int(rng.integers(5, 200))
        xyz = rng.uniform(-40, 260, size=(b, n, 3)).astype(np.float32)
        mins = xyz.min(axis=1)
        maxs = xyz.max(axis=1)
        gauss_b = rng.normal(size=(3, d_pos // 2)).astype(np.float32)

        mod = ref_posenc.PositionEmbeddingCoordsSine(
            pos_type="fourier", d_pos=d_pos, normalize=True, gauss_scale=1.0
        )
        mod.gauss_B.copy_(torch.as_tensor(gauss_b))
        ref = mod(
            torch.as_tensor(xyz),
            num_channels=d_pos,
            input_range=[torch.as_tensor(mins), torch.as_tensor(maxs)],
        ).permute(0, 2, 1).numpy()

        ours = np.asarray(
            fourier_embeddings(
                jnp.asarray(xyz), jnp.asarray(gauss_b),
                mins=jnp.asarray(mins), maxs=jnp.asarray(maxs),
                normalize=True,
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"fourier trial {trial}")


def test_sine_posenc_differential(ref_posenc):
    import torch

    rng = np.random.default_rng(20260825)
    for trial, d_pos in enumerate([128, 96, 30]):
        b, n = 2, 64
        xyz = rng.uniform(0, 500, size=(b, n, 3)).astype(np.float32)
        mins = xyz.min(axis=1)
        maxs = xyz.max(axis=1)

        mod = ref_posenc.PositionEmbeddingCoordsSine(
            pos_type="sine", d_pos=d_pos, normalize=True
        )
        ref = mod(
            torch.as_tensor(xyz),
            num_channels=d_pos,
            input_range=[torch.as_tensor(mins), torch.as_tensor(maxs)],
        ).permute(0, 2, 1).numpy()

        ours = np.asarray(
            sine_embeddings(
                jnp.asarray(xyz), d_pos,
                mins=jnp.asarray(mins), maxs=jnp.asarray(maxs),
                normalize=True,
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"sine d_pos={d_pos}")
