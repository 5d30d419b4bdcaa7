"""Device-trace profile of the flagship eval forward (bench.py workload).

`jax.profiler.trace` works through the remote tunnel and contains REAL
device events (per-fusion durations + HLO long_name on the /device:TPU:0
pid lane) — the only reliable per-op breakdown here; per-call host timings
carry +/-100 ms of tunnel RPC noise (CLAUDE.md). This script runs the
exact bench forward N times under a trace and aggregates the device lane
into named buckets (convs / pyramid / attention / gathers / norms / rest).

Run ON THE REAL CHIP (ambient env): python tools/profile_forward.py
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_DIR = "/tmp/mask3d_trace"


def run_traced(n_iter=6):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mask3d_tpu.config import Config, apply_overrides
    from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
    from mask3d_tpu.sparse import build_sparse_batch
    from mask3d_tpu.train.loop import _sb_kwargs, init_state, level_capacities

    cfg = Config()
    # Mirror bench.py's flagship overrides exactly (the profile must
    # explain the bench's device time).
    apply_overrides(cfg, [
        "data.point_bucket_multiple=49152",
        "model.compute_dtype=bfloat16",
        "model.int8_stride1=true",
        "model.int8_act_sigma=10",
        "model.int8_residual=true",
        "model.unit_features=true",
    ])
    extra = os.environ.get("MASK3D_BENCH_OVERRIDES", "")
    if extra:
        apply_overrides(cfg, [s for s in extra.split(";") if s])

    rng = np.random.default_rng(0)
    items = [
        make_synthetic_scene(
            rng, num_rooms_x=3, num_rooms_y=2, room_size=36, height=18,
            jitter=0.3, dropout=0.2, multi_floor=True,
        )
        for _ in range(8)
    ]
    collate = VoxelizeCollate(
        point_bucket_multiple=int(cfg.data.point_bucket_multiple)
    )
    host = collate(items)
    batch = host.device
    state, model, _, _ = init_state(cfg, batch)

    from functools import partial

    from mask3d_tpu.data.transfer import (
        decode_pyramid_u8,
        encode_pyramid_u8,
    )
    from mask3d_tpu.sparse import unpack_keys

    n_cap_s = int(batch.coords.shape[1])

    @partial(jax.jit, static_argnums=(3,))
    def infer(params, buffers, buf, n_cap):
        caps = level_capacities(cfg, n_cap)
        (keys, counts, dims), coarse = decode_pyramid_u8(
            buf, 8, n_cap, caps
        )
        coords = unpack_keys(keys, dims)
        rows = jnp.arange(keys.shape[1], dtype=jnp.int32)[None]
        coords = jnp.where((rows < counts[:, None])[..., None], coords, 0)
        feats = jnp.ones(keys.shape + (1,), jnp.float32)
        sb = build_sparse_batch(
            coords, counts, dims, caps, precomputed_levels=coarse,
            **_sb_kwargs(cfg, batch.grid_dims),
        )
        out = model.apply(
            {"params": params, "buffers": buffers},
            sb, feats, coords.astype(jnp.float32), True,
            grid_dims=batch.grid_dims, aux_masks=False,
        )
        return out.pred_class, out.pred_masks

    buf = jnp.asarray(encode_pyramid_u8(
        np.asarray(batch.coords), batch.counts, batch.dims,
        level_capacities(cfg, n_cap_s),
    ))
    args = (state.params, state.buffers, buf, n_cap_s)
    # warm
    _ = jax.device_get(infer(*args)[0])

    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        outs = [infer(*args) for _ in range(n_iter)]
        _ = jax.device_get(outs[-1][0])
    return n_iter


def aggregate(n_iter):
    paths = glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {TRACE_DIR}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # find the device lane pid
    dev_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "pjrt" not in str(e.get("args", {}).get("name", "")).lower()
    }
    # Exclusive durations: conditionals/whiles nest their branch ops as
    # child X events on the same (pid, tid) lane — subtract child overlap
    # so parents don't double-count.
    lanes = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):  # parent program span, not an op
            continue
        lanes.setdefault(e.get("tid"), []).append(e)
    by_name = {}
    long_names = {}
    total = 0.0
    for evs in lanes.values():
        evs.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0.0))))
        stack = []  # (end_ts, child_time_accum index into records)
        recs = []
        for e in evs:
            ts = float(e["ts"])
            dur = float(e.get("dur", 0.0))
            while stack and stack[-1][0] <= ts + 1e-9:
                stack.pop()
            if stack:
                recs[stack[-1][1]]["child"] += dur
            recs.append({"name": e.get("name", "?"), "dur": dur,
                         "child": 0.0,
                         "ln": str(e.get("args", {}).get("long_name", ""))})
            stack.append((ts + dur, len(recs) - 1))
        for r in recs:
            excl = max(r["dur"] - r["child"], 0.0)
            by_name[r["name"]] = by_name.get(r["name"], 0.0) + excl
            if r["ln"] and r["name"] not in long_names:
                long_names[r["name"]] = r["ln"]
            total += excl

    def bucket(name):
        n = (name + " " + long_names.get(name, "")).lower()
        if "convolution" in n or "conv" in n:
            return "convs"
        if "reduce-window" in n or "select-and-scatter" in n:
            return "pools"
        if "gather" in n:
            return "gathers"
        if "scatter" in n:
            return "scatters"
        if "dot" in n:
            return "dots"
        if "sort" in n:
            return "sorts"
        if "cumsum" in n or "reduce" in n:
            return "reduces"
        if "fusion" in n:
            return "fusion(other)"
        if "copy" in n or "transpose" in n or "bitcast" in n:
            return "copies"
        return "other"

    buckets = {}
    for name, dur in by_name.items():
        buckets.setdefault(bucket(name), 0.0)
        buckets[bucket(name)] += dur
    per_iter = total / n_iter / 1e3
    print(f"device total: {per_iter:.1f} ms/forward  ({len(by_name)} ops)")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:16s} {d/n_iter/1e3:8.2f} ms  "
              f"({100*d/total:5.1f}%)")
    print("top 20 ops:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:20]:
        ln = long_names.get(name, "")
        print(f"  {dur/n_iter/1e3:8.2f} ms  {name[:40]}  {ln[:160]}")
    # full dump for offline tail analysis
    with open("/tmp/ops_full.json", "w") as f:
        json.dump(
            {
                "n_iter": n_iter,
                "ops": [
                    {"name": k, "dur_ms": v / n_iter / 1e3,
                     "long_name": long_names.get(k, "")}
                    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])
                ],
            },
            f,
        )
    print("full op dump: /tmp/ops_full.json")


if __name__ == "__main__":
    n = run_traced()
    aggregate(n)
