"""Multi-host readiness (SURVEY §5.8): the per-host input-sharding
arithmetic and writer guards are unit-tested here; actual multi-process
execution needs real multi-host hardware (the driver validates the
single-process no-op path end-to-end through every other test)."""

import numpy as np
import pytest

from mask3d_tpu.parallel import dist


def test_local_batch_indices_partition():
    """Hosts' slices are disjoint, ordered, and cover the global batch."""
    g = np.array([7, 3, 9, 1, 5, 0, 4, 2])
    for pc in (1, 2, 4, 8):
        slices = [dist.local_batch_indices(g, pi, pc) for pi in range(pc)]
        assert all(len(s) == len(g) // pc for s in slices)
        np.testing.assert_array_equal(np.concatenate(slices), g)


def test_local_batch_indices_deterministic_across_hosts():
    """Every host computes the same assignment without communication:
    the same (global_idxs, pi, pc) always yields the same slice."""
    g = np.arange(16)
    a = dist.local_batch_indices(g, 2, 4)
    b = dist.local_batch_indices(g, 2, 4)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, g[8:12])


def test_local_batch_indices_rejects_ragged():
    with pytest.raises(AssertionError):
        dist.local_batch_indices(np.arange(10), 0, 4)


def test_single_process_noops():
    """At process_count()==1 nothing changes: identity slice, main
    process True, initialize skipped when the flag is off."""
    from mask3d_tpu.config import Config

    g = np.arange(8)
    np.testing.assert_array_equal(dist.local_batch_indices(g), g)
    assert dist.process_count() == 1
    assert dist.is_main_process()
    cfg = Config()
    assert cfg.trainer.distributed is False
    dist.maybe_initialize(cfg)  # must not raise / must not initialize
    assert dist.process_count() == 1


def test_put_global_single_process_matches_shard_batch():
    import jax
    from mask3d_tpu.parallel import make_mesh

    mesh = make_mesh(2)
    x = {"a": np.arange(8, dtype=np.float32).reshape(4, 2)}
    out = dist.put_global(x, mesh)
    np.testing.assert_array_equal(np.asarray(out["a"]), x["a"])
    assert out["a"].sharding.spec == jax.sharding.PartitionSpec("dp")


def test_metric_logger_write_guard(tmp_path):
    """Non-main processes aggregate but never write files; dedup keeps one
    row per epoch after a crash-resume replay (ADVICE r3)."""
    from mask3d_tpu.train.logging_utils import MetricLogger

    d = str(tmp_path / "run")
    silent = MetricLogger(d, use_tensorboard=False, write_files=False)
    silent.log_step({"loss": 2.0}, step=0)
    means = silent.log_epoch(0, 1)
    assert means["loss"] == 2.0
    import os
    assert not os.path.exists(os.path.join(d, "metrics.csv"))

    main = MetricLogger(d, use_tensorboard=False)
    main.log_step({"loss": 1.0}, 0)
    main.log_epoch(0, 1)
    main.log_step({"loss": 0.5}, 1)
    main.log_epoch(1, 2)
    # simulate crash-resume from the epoch-0 checkpoint: a fresh logger
    # seeds history, then replays epochs 1..2
    re = MetricLogger(d, use_tensorboard=False)
    re.log_step({"loss": 0.4}, 1)
    re.log_epoch(1, 2)
    re.log_step({"loss": 0.3}, 2)
    re.log_epoch(2, 3)
    import csv
    with open(os.path.join(d, "metrics.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    epochs = [int(r["epoch"]) for r in rows]
    assert epochs == [0, 1, 2]  # no duplicates, chronological
    assert float(rows[1]["loss"]) == 0.4  # replayed row supersedes stale
