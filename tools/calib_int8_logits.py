"""Calibrate the int8/bf16 logits-level parity bounds (tests/test_e2e.py).

Replicates the parity16 fixture (16 scenes, one bucket, trained small
model), then prints per-variant logit error stats vs fp32: max/p999/p99
normalized by the fp32 logit std, plus the evaluator mAP deltas. Run on
CPU. Used to pick `int8_act_sigma` and the test tolerances.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from tests.test_e2e import (
        _MAP_KEYS,
        _PARITY_BS,
        N_PARITY_SCENES,
        _variant_eval,
        small_config,
    )
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.train.loop import init_state, make_train_step

    rng = np.random.default_rng(11)
    scenes = [
        make_synthetic_scene(rng, num_rooms_x=2, num_rooms_y=1,
                             room_size=12, height=6, jitter=0.0, dropout=0.5)
        for _ in range(N_PARITY_SCENES)
    ]
    probe = VoxelizeCollate(point_bucket_multiple=64)
    probed = [probe(scenes[i:i + _PARITY_BS])
              for i in range(0, N_PARITY_SCENES, _PARITY_BS)]
    cap = max(int(b.device.coords.shape[1]) for b in probed)
    dims0 = tuple(max(b.device.grid_dims[0][a] for b in probed)
                  for a in range(3))
    coll = VoxelizeCollate(point_bucket_multiple=cap, min_grid_dims=dims0)
    batches = [coll(scenes[i:i + _PARITY_BS])
               for i in range(0, N_PARITY_SCENES, _PARITY_BS)]

    cfg = small_config()
    state, model, criterion, tx = init_state(cfg, batches[0].device)
    train_step = make_train_step(cfg, model, criterion, tx)
    for _ in range(14):
        for b in batches:
            state, losses, _p = train_step(state, b.device)
    print("final loss", float(losses["loss"]))

    ref_m, ref_l = _variant_eval(state, batches, {})
    scale = float(np.std(ref_l))
    print(f"fp32 logit std {scale:.3f}")
    variants = {
        "bf16": {"compute_dtype": "bfloat16"},
        "int8-dyn": {"int8_stride1": True, "compute_dtype": "bfloat16"},
    }
    for s in (4.0, 6.0, 8.0, 10.0, 14.0):
        variants[f"int8-s{s:g}"] = {
            "int8_stride1": True, "compute_dtype": "bfloat16",
            "int8_act_sigma": s,
        }
    for name, ov in variants.items():
        m, l = _variant_eval(state, batches, ov)
        d = np.abs(l - ref_l) / scale
        dm = {k: m[k] - ref_m[k] for k in _MAP_KEYS}
        print(
            f"{name:10s} max={d.max():.3f} p999={np.quantile(d, 0.999):.4f} "
            f"p99={np.quantile(d, 0.99):.4f} "
            + " ".join(f"d{k.split('_')[-1]}={v:+.4f}" for k, v in dm.items())
        )


if __name__ == "__main__":
    main()
