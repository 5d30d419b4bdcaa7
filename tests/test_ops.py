"""Op-level parity tests: FPS and LSAP vs reference oracles.

Reference pattern: every custom kernel ships with a pure-framework oracle
(`mask3d/third_party/pointnet2/pointnet2_test.py`, `RoomFormer/models/ops/test.py`).
"""

import numpy as np
import jax.numpy as jnp

from mask3d_tpu.ops import furthest_point_sample, linear_sum_assignment


def fps_oracle(coords, n_samples):
    """Numpy re-statement of pointnet2 furthest_point_sample semantics."""
    n = coords.shape[0]
    idxs = [0]
    min_d = np.full(n, np.inf)
    for _ in range(n_samples - 1):
        d = ((coords - coords[idxs[-1]]) ** 2).sum(-1)
        min_d = np.minimum(min_d, d)
        idxs.append(int(np.argmax(min_d)))
    return np.array(idxs)


def test_fps_matches_oracle(rng):
    B, N, Q = 3, 200, 16
    coords = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    valid = np.ones((B, N), bool)
    idx = np.asarray(
        furthest_point_sample(jnp.asarray(coords), jnp.asarray(valid), Q)
    )
    for b in range(B):
        exp = fps_oracle(coords[b], Q)
        assert np.array_equal(idx[b], exp)


def test_fps_ignores_padding(rng):
    B, N, Q = 2, 100, 8
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)
    coords[:, 50:] = 1e3  # far-away padding would dominate if not masked
    valid = np.zeros((B, N), bool)
    valid[:, :50] = True
    idx = np.asarray(
        furthest_point_sample(jnp.asarray(coords), jnp.asarray(valid), Q)
    )
    assert (idx < 50).all()
    for b in range(B):
        exp = fps_oracle(coords[b, :50], Q)
        assert np.array_equal(idx[b], exp)


def test_fps_fewer_points_than_queries(rng):
    coords = rng.normal(size=(1, 32, 3)).astype(np.float32)
    valid = np.zeros((1, 32), bool)
    valid[0, :3] = True
    idx = np.asarray(
        furthest_point_sample(jnp.asarray(coords), jnp.asarray(valid), 8)
    )
    assert (idx < 3).all()
    assert set(idx[0][:3].tolist()) == {0, 1, 2} or len(set(idx[0].tolist())) <= 3


def test_lsap_square_vs_scipy(rng):
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    costs = rng.normal(size=(6, 12, 12)).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(costs)))
    for i, c in enumerate(costs):
        rr, cc = scipy_lsa(c)
        exp_total = c[rr, cc].sum()
        got_total = c[np.arange(12), got[i]].sum()
        # assignment must be a permutation and optimal
        assert len(set(got[i].tolist())) == 12
        np.testing.assert_allclose(got_total, exp_total, rtol=1e-5)


def test_lsap_rectangular(rng):
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    # More queries than targets: Q x I with Q > I (the matcher's shape,
    # reference mask3d/models/matcher.py:96 "more predictions than targets")
    q, i = 10, 4
    costs = rng.normal(size=(3, q, i)).astype(np.float32)
    got = np.asarray(linear_sum_assignment(jnp.asarray(costs)))
    for b, c in enumerate(costs):
        rr, cc = scipy_lsa(c)
        matched = got[b] < i  # rows assigned to real columns
        assert matched.sum() == i
        got_total = c[np.nonzero(matched)[0], got[b][matched]].sum()
        np.testing.assert_allclose(got_total, c[rr, cc].sum(), rtol=1e-5)


def test_lsap_host_method_matches(rng):
    costs = rng.normal(size=(2, 8, 8)).astype(np.float32)
    dev = np.asarray(linear_sum_assignment(jnp.asarray(costs), method="device"))
    host = np.asarray(linear_sum_assignment(jnp.asarray(costs), method="host"))
    for b in range(2):
        total_d = costs[b][np.arange(8), dev[b]].sum()
        total_h = costs[b][np.arange(8), host[b]].sum()
        np.testing.assert_allclose(total_d, total_h, rtol=1e-5)
