"""Scheduler config groups (reference `mask3d/conf/scheduler/*.yaml`):
exponentiallr, onecyclelr, and the StepLR pair shipped as steplr.yaml AND
lambdalr.yaml (identical contents — StepLR at step_size 99999,
interval=epoch, i.e. constant for any practical run)."""

import numpy as np
import optax

from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.train.loop import make_optimizer


def _lr_trace(cfg, steps):
    """Realized lr at each step via the optimizer's scale on a unit grad."""
    tx = make_optimizer(cfg)
    params = {"w": np.zeros(1, np.float32)}
    state = tx.init(params)
    lrs = []
    g = {"w": np.ones(1, np.float32)}
    for _ in range(steps):
        upd, state = tx.update(g, state, params)
        lrs.append(-float(upd["w"][0]))
    return np.array(lrs)


def test_lambdalr_is_constant_at_shipped_step_size():
    cfg = Config()
    apply_overrides(cfg, ["scheduler.name=lambdalr", "optimizer.lr=0.01"])
    lrs = _lr_trace(cfg, 5)
    np.testing.assert_allclose(lrs, 0.01, rtol=1e-3)


def test_steplr_decays_at_epoch_boundaries():
    cfg = Config()
    apply_overrides(cfg, [
        "scheduler.name=steplr", "optimizer.lr=0.01",
        "scheduler.step_size=2", "scheduler.gamma=0.1",
        "scheduler.steps_per_epoch=3",
    ])
    lrs = _lr_trace(cfg, 13)
    # boundary = step_size * steps_per_epoch = 6 optimizer steps
    np.testing.assert_allclose(lrs[:6], 0.01, rtol=1e-3)
    np.testing.assert_allclose(lrs[6:12], 0.001, rtol=1e-3)
    np.testing.assert_allclose(lrs[12], 1e-4, rtol=1e-3)


def test_exponentiallr_matches_reference_gamma():
    cfg = Config()
    apply_overrides(cfg, ["optimizer.lr=0.01"])  # default exponentiallr
    lrs = _lr_trace(cfg, 3)
    gamma = cfg.scheduler.gamma
    np.testing.assert_allclose(
        lrs, 0.01 * gamma ** np.arange(3), rtol=1e-3
    )
