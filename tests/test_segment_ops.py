"""Oracle tests for segment aggregation ops (SURVEY.md §2.2 N4).

Brute-force numpy oracles matching torch_scatter scatter_mean/max/min
semantics (empty segments -> 0), the pattern used by the reference's own
kernel tests (`mask3d/utils/pointops2/functions/test_*.py`).
"""

import numpy as np
import pytest

from mask3d_tpu.ops.segment import (
    batched_segment_reduce,
    segment_max,
    segment_mean,
    segment_min,
)


def _oracle(values, ids, num_segments, reduce):
    out = np.zeros((num_segments, values.shape[-1]), np.float32)
    for s in range(num_segments):
        rows = values[ids == s]
        if len(rows) == 0:
            continue
        if reduce == "mean":
            out[s] = rows.mean(axis=0)
        elif reduce == "max":
            out[s] = rows.max(axis=0)
        else:
            out[s] = rows.min(axis=0)
    return out


@pytest.mark.parametrize("reduce", ["mean", "max", "min"])
def test_segment_reduce_matches_oracle(reduce):
    rng = np.random.default_rng(0)
    n, c, s = 257, 5, 12  # segment 7 left empty below
    values = rng.normal(size=(n, c)).astype(np.float32)
    ids = rng.integers(0, s, size=n).astype(np.int32)
    ids[ids == 7] = 3
    fn = {"mean": segment_mean, "max": segment_max, "min": segment_min}[
        reduce
    ]
    got = np.asarray(fn(values, ids, s))
    want = _oracle(values, ids, s, reduce)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_out_of_range_ids_dropped():
    values = np.ones((4, 2), np.float32)
    ids = np.array([0, -1, 5, 1], np.int32)  # -1 and 5 out of range for s=2
    got = np.asarray(segment_mean(values, ids, 2))
    np.testing.assert_allclose(got, np.ones((2, 2), np.float32))


@pytest.mark.parametrize("reduce", ["mean", "max", "min"])
def test_batched_padded_layout(reduce):
    rng = np.random.default_rng(1)
    b, n, c, s = 3, 64, 4, 6
    values = rng.normal(size=(b, n, c)).astype(np.float32)
    ids = rng.integers(0, s, size=(b, n)).astype(np.int32)
    counts = np.array([64, 40, 0])
    valid = np.arange(n)[None] < counts[:, None]
    got = np.asarray(
        batched_segment_reduce(values, ids, valid, s, reduce=reduce)
    )
    for i in range(b):
        v, d = values[i][valid[i]], ids[i][valid[i]]
        want = _oracle(v, d, s, reduce)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)
