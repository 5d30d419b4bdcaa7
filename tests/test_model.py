"""Model-level tests: backbone + Mask3D decoder forward/backward sanity.

Shapes are tiny so the whole graph runs quickly on the CPU test backend; the
structural assertions mirror the reference model contract
(`mask3d/models/mask3d.py:280-518`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.models import Mask3D
from mask3d_tpu.models.backbone import Res16UNet14A
from mask3d_tpu.sparse import build_sparse_batch


def make_scene_batch(rng, B=2, N=256, dims=(24, 24, 12)):
    coords = np.zeros((B, N, 3), np.int32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        # Surface-like points (a floor plane + walls) so levels merge well.
        n = rng.integers(N // 2, N - 10)
        pts = np.stack(
            [
                rng.integers(0, dims[0], n),
                rng.integers(0, dims[1], n),
                np.minimum(rng.integers(0, 4, n), dims[2] - 1),
            ],
            axis=1,
        ).astype(np.int32)
        pts = np.unique(pts, axis=0)
        key = (pts[:, 0] * dims[1] + pts[:, 1]) * dims[2] + pts[:, 2]
        pts = pts[np.argsort(key)]
        coords[b, : len(pts)] = pts
        counts[b] = len(pts)
    dims_arr = np.tile(np.array(dims, np.int32), (B, 1))
    return coords, counts, dims_arr


SMALL_KW = dict(
    num_classes=1,
    hidden_dim=32,
    dim_feedforward=64,
    num_queries=5,
    num_heads=4,
    num_decoders=2,
    sample_sizes=(8, 16, 32, 64, 128),
    backbone_name="Res16UNet14A",
    conv1_kernel_size=3,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    coords, counts, dims = make_scene_batch(rng)
    sb = build_sparse_batch(
        coords, counts, dims,
        level_capacities=[128, 64, 32, 16],
        conv1_kernel_size=3,
    )
    B, N = coords.shape[:2]
    feats = jnp.ones((B, N, 1), jnp.float32)
    raw = jnp.asarray(coords, jnp.float32)
    return sb, feats, raw


def test_backbone_shapes(scene):
    sb, feats, _ = scene
    model = Res16UNet14A(in_channels=1, conv1_kernel_size=3)
    params = model.init(jax.random.PRNGKey(0), feats, sb)
    out, fmaps = model.apply(params, feats, sb)
    assert out.shape == (2, 256, 96)  # PLANES[7]
    assert [f.shape[1] for f in fmaps] == [16, 32, 64, 128, 256]
    assert [f.shape[2] for f in fmaps] == [256, 128, 128, 96, 96]
    for f in fmaps:
        assert np.isfinite(np.asarray(f)).all()
    # Padding rows stay zero at stride-1 output.
    v = np.asarray(sb.levels[0].valid)
    assert np.abs(np.asarray(out)[~v]).max() == 0


def test_mask3d_forward_train_and_eval(scene):
    sb, feats, raw = scene
    model = Mask3D(**SMALL_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sb, feats, raw, False,
    )
    out = model.apply(
        variables, sb, feats, raw, False,
        rngs={"sample": jax.random.PRNGKey(2)},
    )
    L = SMALL_KW["num_decoders"] * 4 + 1
    assert out.aux_pred_class.shape == (L, 2, 5, 2)
    assert out.aux_pred_masks.shape == (L, 2, 256, 5)
    assert out.sampled_coords.shape == (2, 5, 3)
    assert np.isfinite(np.asarray(out.aux_pred_class)).all()
    assert np.isfinite(np.asarray(out.aux_pred_masks)).all()

    # Eval mode needs no sample rng and is deterministic.
    e1 = model.apply(variables, sb, feats, raw, True)
    e2 = model.apply(variables, sb, feats, raw, True)
    np.testing.assert_array_equal(
        np.asarray(e1.pred_masks), np.asarray(e2.pred_masks)
    )

    # aux_masks=False (inference fast path): identical final predictions,
    # aux_pred_masks collapsed to L=1, class heads untouched.
    e3 = model.apply(variables, sb, feats, raw, True, aux_masks=False)
    assert e3.aux_pred_masks.shape[0] == 1
    assert e3.aux_pred_class.shape[0] == L
    np.testing.assert_array_equal(
        np.asarray(e3.pred_masks), np.asarray(e1.pred_masks)
    )
    np.testing.assert_array_equal(
        np.asarray(e3.pred_class), np.asarray(e1.pred_class)
    )


def test_mask3d_gradients_flow(scene):
    sb, feats, raw = scene
    model = Mask3D(**SMALL_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sb, feats, raw, False,
    )
    params = variables["params"]
    buffers = {"buffers": variables["buffers"]}

    def loss_fn(p):
        out = model.apply(
            {"params": p, **buffers}, sb, feats, raw, False,
            rngs={"sample": jax.random.PRNGKey(3)},
        )
        v = sb.levels[0].valid
        return jnp.sum(
            jnp.where(v[None, ..., None], out.aux_pred_masks, 0) ** 2
        ) + jnp.sum(out.aux_pred_class**2)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for g in flat)
    # The vast majority of parameters must receive gradient (all 13 outputs
    # supervise every decoder layer + backbone).
    assert nonzero / len(flat) > 0.9, f"only {nonzero}/{len(flat)} grads nonzero"
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()


def test_parametric_and_random_queries(scene):
    sb, feats, raw = scene
    for kw in (
        dict(non_parametric_queries=False),
        dict(non_parametric_queries=False, random_queries=True),
        dict(
            non_parametric_queries=False,
            random_query_both=True,
            random_normal=True,
        ),
    ):
        model = Mask3D(**{**SMALL_KW, **kw})
        variables = model.init(
            {
                "params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1),
                "queries": jax.random.PRNGKey(2),
            },
            sb, feats, raw, False,
        )
        out = model.apply(
            variables, sb, feats, raw, False,
            rngs={
                "sample": jax.random.PRNGKey(3),
                "queries": jax.random.PRNGKey(4),
            },
        )
        assert np.isfinite(np.asarray(out.pred_masks)).all()


def test_bottleneck_backbone_and_registry(scene):
    """Res16UNet50 (Bottleneck, expansion 4) runs in both impls and the
    full registry mirrors the reference family
    (`mask3d/models/res16unet.py:317-399`)."""
    from mask3d_tpu.models.backbone import BACKBONES, Res16UNet50

    for name in (
        "Res16UNet14A2", "Res16UNet14B", "Res16UNet14C", "Res16UNet14D",
        "Res16UNet18D", "Res16UNet50", "Res16UNet101", "Custom30M",
    ):
        assert name in BACKBONES

    sb, feats, _ = scene
    model = Res16UNet50(in_channels=1, conv1_kernel_size=3)
    params = model.init(jax.random.PRNGKey(0), feats, sb)
    out, fmaps = model.apply(params, feats, sb)
    # PLANES[7] * expansion 4
    assert out.shape == (2, 256, 256 * 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mask3d_dense_matches_gather():
    """Full Mask3D eval forward: dense execution (grid convs + grid-space
    pooled pyramid, production `build_pool_parents=False` context) matches
    the gather execution (row convs + avg_pool chain) on the same params."""
    rng = np.random.default_rng(11)
    coords, counts, dims = make_scene_batch(rng, dims=(16, 16, 16))
    grid_dims = tuple((16 >> s, 16 >> s, 16 >> s) for s in range(5))
    caps = [128, 64, 32, 16]
    B, N = coords.shape[:2]
    feats = jnp.ones((B, N, 1), jnp.float32)
    raw = jnp.asarray(coords, jnp.float32)

    sb_g = build_sparse_batch(coords, counts, dims, level_capacities=caps,
                              conv1_kernel_size=3)
    sb_d = build_sparse_batch(coords, counts, dims, level_capacities=caps,
                              conv1_kernel_size=None, build_block_maps=False,
                              grid_dims=grid_dims, build_pool_parents=False)

    mg = Mask3D(**SMALL_KW, backbone_impl="gather")
    md = Mask3D(**SMALL_KW, backbone_impl="dense")
    variables = mg.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sb_g, feats, raw, True,
    )
    out_g = mg.apply(variables, sb_g, feats, raw, True)
    out_d = md.apply(variables, sb_d, feats, raw, True,
                     grid_dims=grid_dims)

    v = np.asarray(sb_g.levels[0].valid)
    np.testing.assert_allclose(
        np.asarray(out_d.pred_class), np.asarray(out_g.pred_class),
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_d.pred_masks)[v], np.asarray(out_g.pred_masks)[v],
        rtol=5e-3, atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_d.sampled_coords), np.asarray(out_g.sampled_coords),
        rtol=1e-5, atol=1e-5,
    )


def test_fold_small_stages_matches_unfolded():
    """`fold_small_stages` routes stage 1 through the z-folded chain with
    the SAME param tree (checkpoint-interchangeable) and matching output."""
    rng = np.random.default_rng(3)
    coords, counts, dims = make_scene_batch(rng, dims=(16, 16, 16))
    grid_dims = tuple((16 >> s, 16 >> s, 16 >> s) for s in range(5))
    caps = [128, 64, 32, 16]
    feats = jnp.ones((coords.shape[0], coords.shape[1], 1), jnp.float32)
    sb = build_sparse_batch(coords, counts, dims, caps,
                            conv1_kernel_size=None, build_block_maps=False,
                            grid_dims=grid_dims, build_pool_parents=False)
    m0 = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="dense")
    m1 = Res16UNet14A(in_channels=1, conv1_kernel_size=3, impl="dense",
                      fold_small_stages=True)
    params = m0.init(jax.random.PRNGKey(0), feats, sb, grid_dims)
    out0, fm0 = m0.apply(params, feats, sb, grid_dims)
    out1, fm1 = m1.apply(params, feats, sb, grid_dims)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=2e-4, atol=2e-4)


def test_bottleneck_dense_matches_gather():
    """Bottleneck path parity: dense-grid execution == gather execution."""
    from mask3d_tpu.models.backbone import Res16UNet50

    from typing import Sequence

    class ShallowBottleneck(Res16UNet50):
        LAYERS: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)

    rng = np.random.default_rng(3)
    coords, counts, dims = make_scene_batch(rng, dims=(16, 16, 16))
    grid_dims = tuple((16 >> s, 16 >> s, 16 >> s) for s in range(5))
    cells = tuple(int(np.prod(d)) for d in grid_dims)
    caps = [128, 64, 32, 16]
    feats = jnp.ones((coords.shape[0], coords.shape[1], 1), jnp.float32)

    sb_g = build_sparse_batch(coords, counts, dims, caps,
                              conv1_kernel_size=3, grid_cells=cells)
    m_g = ShallowBottleneck(in_channels=1, conv1_kernel_size=3, impl="gather")
    params = m_g.init(jax.random.PRNGKey(0), feats, sb_g)
    out_g, fm_g = m_g.apply(params, feats, sb_g)

    sb_d = build_sparse_batch(coords, counts, dims, caps,
                              conv1_kernel_size=None,
                              build_block_maps=False, grid_cells=cells)
    m_d = ShallowBottleneck(in_channels=1, conv1_kernel_size=3, impl="dense")
    out_d, fm_d = m_d.apply(params, feats, sb_d, grid_dims)

    v = np.asarray(sb_g.levels[0].valid)
    np.testing.assert_allclose(
        np.asarray(out_d)[v], np.asarray(out_g)[v], rtol=2e-3, atol=2e-3
    )


def test_chunked_attention_matches_oneshot():
    """Online-softmax key-chunk schedule == one-shot softmax, including the
    all-blocked-row convention (uniform weights over -1e9 logits)."""
    from mask3d_tpu.models.mask3d import MultiheadAttention

    rng = np.random.default_rng(11)
    B, Q, S, D, H = 2, 5, 64, 32, 4
    q = jnp.asarray(rng.normal(size=(B, Q, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    mask = jnp.asarray(rng.random((B, Q, S)) < 0.3)
    # One fully-blocked query row and one fully-open row.
    mask = mask.at[0, 1].set(True).at[1, 2].set(False)

    m = MultiheadAttention(D, H)
    params = m.init(jax.random.PRNGKey(0), q, k, v, mask)
    ref = m.apply(params, q, k, v, mask)
    for chunk in (8, 16, 32):
        out = m.apply(params, q, k, v, mask, chunk=chunk)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
    # chunk that does not divide S falls back to one-shot exactly
    out = m.apply(params, q, k, v, mask, chunk=24)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mask3d_attention_chunk_parity(scene):
    """Full model: attention_chunk (flash schedule on full-level eval
    memories) changes nothing but fp reassociation."""
    sb, feats, raw = scene
    model = Mask3D(**SMALL_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sb, feats, raw, False,
    )
    model_c = Mask3D(**SMALL_KW, attention_chunk=16)
    e0 = model.apply(variables, sb, feats, raw, True)
    e1 = model_c.apply(variables, sb, feats, raw, True)
    np.testing.assert_allclose(
        np.asarray(e1.pred_masks), np.asarray(e0.pred_masks),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(e1.pred_class), np.asarray(e0.pred_class),
        rtol=1e-4, atol=1e-4,
    )


def test_mask3d_attention_pallas_parity(scene):
    """Fused Pallas cross-attention (interpreter on CPU) == one-shot."""
    sb, feats, raw = scene
    model = Mask3D(**SMALL_KW)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        sb, feats, raw, False,
    )
    model_p = Mask3D(**SMALL_KW, attention_pallas_tile=32)
    e0 = model.apply(variables, sb, feats, raw, True)
    e1 = model_p.apply(variables, sb, feats, raw, True)
    np.testing.assert_allclose(
        np.asarray(e1.pred_masks), np.asarray(e0.pred_masks),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(e1.pred_class), np.asarray(e0.pred_class),
        rtol=1e-4, atol=1e-4,
    )
