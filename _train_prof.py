import time, numpy as np, jax
from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.train.loop import init_state, make_train_step

cfg = Config(); apply_overrides(cfg, ["data.point_bucket_multiple=65536"])
rng = np.random.default_rng(0)
items = [make_synthetic_scene(rng, 3, 2, 36, 18, 0.3, 0.2, True) for _ in range(4)]
host = VoxelizeCollate(point_bucket_multiple=65536)(items)
b = host.device
state, model, criterion, tx = init_state(cfg, b)
step = make_train_step(cfg, model, criterion, tx)
t0=time.perf_counter(); state, losses = step(state, b); _=jax.device_get(losses["loss"]); print(f"train step compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(3):
    t0=time.perf_counter(); state, losses = step(state, b); lv=float(jax.device_get(losses["loss"]))
    print(f"train step: {(time.perf_counter()-t0)*1000:.0f} ms  loss={lv:.2f}", flush=True)

# isolate criterion cost (device LSAP)
import jax.numpy as jnp
from mask3d_tpu.sparse import build_sparse_batch
from mask3d_tpu.train.loop import _sb_kwargs, level_capacities
kw = _sb_kwargs(cfg, b.grid_dims)
@jax.jit
def crit_only(state_params, batch):
    sb = build_sparse_batch(batch.coords, batch.counts, batch.dims, level_capacities(cfg, batch.coords.shape[1]), **kw)
    out = model.apply({"params": state_params, "buffers": state.buffers}, sb, batch.feats, batch.coords.astype(jnp.float32), True, grid_dims=batch.grid_dims)
    losses = criterion(out, batch.target.with_label_offset(1), sb.levels[0].valid)
    return losses["loss"]
t0=time.perf_counter(); r=crit_only(state.params, b); _=jax.device_get(r); print(f"fwd+criterion compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter(); r=crit_only(state.params, b); _=jax.device_get(r); print(f"fwd+criterion: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
