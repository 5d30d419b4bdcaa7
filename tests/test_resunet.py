"""MinkUNet/ResUNet alternative-backbone family + SE blocks + model registry.

Mirrors the reference's vestigial model zoo (`mask3d/models/resunet.py`,
`mask3d/models/modules/senet_block.py`, `mask3d/models/__init__.py:14-44`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mask3d_tpu.sparse import build_sparse_batch

from tests.test_model import make_scene_batch


def _scene(rng_seed=7, dims=(24, 24, 12)):
    rng = np.random.default_rng(rng_seed)
    coords, counts, dims_arr = make_scene_batch(rng, dims=dims)
    sb = build_sparse_batch(
        coords, counts, dims_arr,
        level_capacities=[128, 64, 32, 16],
        conv1_kernel_size=3,
    )
    feats = jnp.ones((coords.shape[0], coords.shape[1], 1), jnp.float32)
    return sb, feats


def test_registry_and_load_model(capsys):
    from mask3d_tpu.models import MODELS, get_models, load_model

    for name in (
        "ResUNet14", "ResUNet18", "ResUNet18INBN", "ResUNet34", "ResUNet50",
        "ResUNet101", "ResUNet14D", "ResUNet18D", "ResUNet34D", "ResUNet34E",
        "ResUNet34F", "SEResUNet14", "SEResUNet50",
        "Res16UNet34C",  # both families share the registry
    ):
        assert name in MODELS, name

    cls = load_model("ResUNet14")
    assert cls is MODELS["ResUNet14"]
    assert cls in get_models()
    # Unknown name prints the options and returns None
    # (`mask3d/models/__init__.py:36-41`).
    assert load_model("NoSuchNet") is None
    assert "ResUNet14" in capsys.readouterr().out


def test_resunet14_forward_shapes():
    from mask3d_tpu.models import ResUNet14

    sb, feats = _scene()
    model = ResUNet14(in_channels=1, out_channels=20, conv1_kernel_size=3)
    params = model.init(jax.random.PRNGKey(0), feats, sb)
    out, fmaps = model.apply(params, feats, sb)
    assert out.shape == (2, 256, 20)
    # strides [8, 4, 2, 1] -> level capacities [32, 64, 128, 256]
    assert [f.shape[1] for f in fmaps] == [32, 64, 128, 256]
    assert fmaps[-1].shape[2] == 20
    for f in fmaps:
        assert np.isfinite(np.asarray(f)).all()


def test_se_blocks_forward_and_gating():
    """SE gating keeps shapes, stays finite, and actually modulates the
    features (sigmoid gate != 1)."""
    from mask3d_tpu.models.resunet import ResUNet14, SEResUNet14

    sb, feats = _scene()
    se = SEResUNet14(in_channels=1, out_channels=8, conv1_kernel_size=3)
    params_se = se.init(jax.random.PRNGKey(1), feats, sb)
    out_se, _ = se.apply(params_se, feats, sb)
    assert out_se.shape == (2, 256, 8)
    assert np.isfinite(np.asarray(out_se)).all()
    # The SE MLP introduces extra params vs the plain block.
    plain = ResUNet14(in_channels=1, out_channels=8, conv1_kernel_size=3)
    params_plain = plain.init(jax.random.PRNGKey(1), feats, sb)
    n_se = sum(x.size for x in jax.tree.leaves(params_se))
    n_plain = sum(x.size for x in jax.tree.leaves(params_plain))
    assert n_se > n_plain


def test_resunet_dense_matches_gather():
    """Dense-grid execution == gather execution for the MinkUNet topology."""
    from mask3d_tpu.models.resunet import ResUNet34E

    from typing import Sequence

    class Shallow(ResUNet34E):
        LAYERS: Sequence[int] = (1, 1, 1, 1, 1, 1)

    rng = np.random.default_rng(3)
    coords, counts, dims = make_scene_batch(rng, dims=(16, 16, 16))
    grid_dims = tuple((16 >> s, 16 >> s, 16 >> s) for s in range(5))
    cells = tuple(int(np.prod(d)) for d in grid_dims)
    caps = [128, 64, 32, 16]
    feats = jnp.ones((coords.shape[0], coords.shape[1], 1), jnp.float32)

    sb_g = build_sparse_batch(coords, counts, dims, caps,
                              conv1_kernel_size=3, grid_cells=cells)
    m_g = Shallow(in_channels=1, out_channels=8, conv1_kernel_size=3,
                  impl="gather")
    params = m_g.init(jax.random.PRNGKey(0), feats, sb_g)
    out_g, _ = m_g.apply(params, feats, sb_g)

    sb_d = build_sparse_batch(coords, counts, dims, caps,
                              conv1_kernel_size=None,
                              build_block_maps=False, grid_cells=cells)
    m_d = Shallow(in_channels=1, out_channels=8, conv1_kernel_size=3,
                  impl="dense")
    out_d, _ = m_d.apply(params, feats, sb_d, grid_dims)

    v = np.asarray(sb_g.levels[0].valid)
    np.testing.assert_allclose(
        np.asarray(out_d)[v], np.asarray(out_g)[v], rtol=2e-3, atol=2e-3
    )
