"""Linear sum assignment (Hungarian matching) on device.

TPU-native replacement for `scipy.optimize.linear_sum_assignment` as consumed
by the reference matcher (`mask3d/models/matcher.py:9,170`). The reference
synchronizes to the host 13 times per training step (final output + 12 aux
mask modules, `mask3d/models/criterion.py:235,262`), once per batch item; here
the solver is a jittable shortest-augmenting-path (Jonker-Volgenant) loop
that `vmap`s over all (aux-level x batch-item) problems at once, so matching
stays on device inside the jitted train step.

Problems are small (num_queries 25..100 x <=32 instances), so the O(n^3)
sequential loop is negligible next to the model FLOPs.

A `host` method using SciPy via `jax.pure_callback` is provided as the parity
oracle and fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

SENT = np.int32(2**31 - 1)  # sentinel for "unassigned" (host constant)


def _solve_square(cost):
    """Exact LSAP for one square cost matrix [n, n] -> col4row i32[n]."""
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    inf = jnp.float32(np.inf)

    def row_step(carry, cur_row):
        u, v, col4row, row4col = carry

        # --- Dijkstra-style shortest augmenting path from cur_row ---
        def cond(st):
            (_, _, _, _, _, sink, _) = st
            return sink == SENT

        def body(st):
            sr, sc, spc, path, i, sink, min_val = st
            sr = sr.at[i].set(True)
            r = min_val + cost[i] - u[i] - v
            better = (~sc) & (r < spc)
            spc = jnp.where(better, r, spc)
            path = jnp.where(better, i, path)
            masked = jnp.where(sc, inf, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            mv = masked[j]
            sc = sc.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt == SENT, j, sink)
            i = jnp.where(nxt == SENT, i, nxt)
            return sr, sc, spc, path, i, sink, mv

        init = (
            jnp.zeros((n,), bool),
            jnp.zeros((n,), bool),
            jnp.full((n,), inf),
            jnp.zeros((n,), jnp.int32),
            cur_row,
            SENT,
            jnp.float32(0.0),
        )
        sr, sc, spc, path, _, sink, min_val = jax.lax.while_loop(
            cond, body, init
        )

        # --- Dual updates (mirrors scipy's _lsap.c) ---
        rows = jnp.arange(n, dtype=jnp.int32)
        u = u.at[cur_row].add(min_val)
        others = sr & (rows != cur_row)
        safe_col = jnp.where(col4row == SENT, 0, col4row)
        u = jnp.where(others, u + min_val - spc[safe_col], u)
        v = jnp.where(sc, v - (min_val - spc), v)

        # --- Augment along the alternating path ---
        def aug_cond(st):
            _, _, _, done = st
            return ~done

        def aug_body(st):
            j, c4r, r4c, _ = st
            i = path[j]
            r4c = r4c.at[j].set(i)
            t = c4r[i]
            c4r = c4r.at[i].set(j)
            return (
                jnp.where(t == SENT, j, t),
                c4r,
                r4c,
                i == cur_row,
            )

        _, col4row, row4col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (sink, col4row, row4col, False)
        )
        return (u, v, col4row, row4col), None

    init = (
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), SENT, jnp.int32),
        jnp.full((n,), SENT, jnp.int32),
    )
    (u, v, col4row, row4col), _ = jax.lax.scan(
        row_step, init, jnp.arange(n, dtype=jnp.int32)
    )
    return col4row


@functools.partial(jax.jit, static_argnames=("method",))
def linear_sum_assignment(cost, method: str = "device"):
    """Batched exact LSAP.

    cost: f32[..., R, C] (rectangular ok; padded internally to square with a
    large finite constant). Returns col4row i32[..., R]: the column assigned
    to each row; rows matched to internal padding columns get their padded
    column index >= C (caller filters with `col4row < C`).
    """
    r, c = cost.shape[-2], cost.shape[-1]
    n = max(r, c)
    cost = cost.astype(jnp.float32)
    # Pad with a per-problem constant just above the max real cost: every
    # assignment of leftover rows/cols to padding then has identical total,
    # so optimality on the real submatrix is preserved — and, unlike a huge
    # big-M, the padded values stay at the same fp32 scale as real costs.
    pad_val = jnp.max(cost, axis=(-2, -1), keepdims=True) + 1.0
    sq = jnp.broadcast_to(pad_val, cost.shape[:-2] + (n, n))
    sq = sq.at[..., :r, :c].set(cost)

    if method == "host":
        def _host(m):
            from scipy.optimize import linear_sum_assignment as lsa

            flat = m.reshape((-1, n, n))
            out = np.stack([lsa(x)[1] for x in flat]).astype(np.int32)
            return out.reshape(m.shape[:-1])

        col4row = jax.pure_callback(
            _host,
            jax.ShapeDtypeStruct(sq.shape[:-1], jnp.int32),
            sq,
            vmap_method="broadcast_all",
        )
    else:
        fn = _solve_square
        for _ in range(cost.ndim - 2):
            fn = jax.vmap(fn)
        col4row = fn(sq)
    return col4row[..., :r]
