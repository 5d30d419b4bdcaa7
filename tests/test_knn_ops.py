"""kNN / ball-query / grouping / interpolation vs brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from mask3d_tpu.ops.knn import (
    ball_query,
    group_points,
    knn,
    pairwise_sqdist,
    three_interpolate,
)


def test_knn_matches_bruteforce(rng):
    B, N, Q, K = 2, 50, 7, 5
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    q = rng.normal(size=(B, Q, 3)).astype(np.float32)
    valid = np.ones((B, N), bool)
    valid[:, 40:] = False
    idx, dist = knn(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid), K)
    idx, dist = np.asarray(idx), np.asarray(dist)
    for b in range(B):
        d = ((q[b][:, None] - pts[b][None]) ** 2).sum(-1)
        d[:, ~valid[b]] = np.inf
        for qi in range(Q):
            exp = np.sort(d[qi])[:K]
            np.testing.assert_allclose(np.sort(dist[b, qi]), exp, rtol=1e-4)
            assert valid[b][idx[b, qi]].all()


def test_ball_query(rng):
    B, N, Q, K = 1, 60, 5, 8
    pts = rng.uniform(0, 10, (B, N, 3)).astype(np.float32)
    q = pts[:, :Q] + 0.01
    valid = np.ones((B, N), bool)
    r = 1.5
    idx, ok = ball_query(jnp.asarray(q), jnp.asarray(pts), jnp.asarray(valid),
                         r, K)
    idx, ok = np.asarray(idx), np.asarray(ok)
    for qi in range(Q):
        d = ((q[0, qi] - pts[0]) ** 2).sum(-1)
        inside = set(np.nonzero(d <= r * r)[0][:K].tolist())
        got = set(idx[0, qi][ok[0, qi]].tolist())
        assert got == set(sorted(inside)[: ok[0, qi].sum()])
        # every returned-ok point is actually inside the ball
        for g in got:
            assert d[g] <= r * r + 1e-5


def test_group_and_interpolate(rng):
    B, N, Q, K, C = 2, 30, 6, 4, 5
    feats = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = rng.integers(0, N, (B, Q, K)).astype(np.int32)
    g = np.asarray(group_points(jnp.asarray(feats), jnp.asarray(idx)))
    for b in range(B):
        for qi in range(Q):
            np.testing.assert_array_equal(g[b, qi], feats[b, idx[b, qi]])

    # interpolation at a known point reproduces its feature
    known = rng.normal(size=(B, N, 3)).astype(np.float32)
    valid = np.ones((B, N), bool)
    unknown = known[:, :Q].copy()
    out = np.asarray(
        three_interpolate(
            jnp.asarray(unknown), jnp.asarray(known), jnp.asarray(valid),
            jnp.asarray(feats),
        )
    )
    np.testing.assert_allclose(out, feats[:, :Q], rtol=1e-3, atol=1e-3)
