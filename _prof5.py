import time, numpy as np, jax, jax.numpy as jnp
from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.sparse import build_sparse_batch
from mask3d_tpu.train.loop import _sb_kwargs, init_state, level_capacities, make_model

cfg = Config(); apply_overrides(cfg, ["data.point_bucket_multiple=65536"])
rng = np.random.default_rng(0)
items = [make_synthetic_scene(rng, 3, 2, 36, 18, 0.3, 0.2, True) for _ in range(4)]
t0=time.perf_counter(); host = VoxelizeCollate(point_bucket_multiple=65536)(items); print(f"collate host: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
b = host.device
caps = level_capacities(cfg, b.coords.shape[1])
print("grid_dims:", b.grid_dims, flush=True)
state, model, _, _ = init_state(cfg, b)

def timed(name, fn, *args):
    t0=time.perf_counter(); r = fn(*args); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:28s} compile+1st {time.perf_counter()-t0:6.1f} s", flush=True)
    t0 = time.perf_counter(); r = fn(*args); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:28s} {(time.perf_counter()-t0)*1000:9.1f} ms", flush=True)

kw = _sb_kwargs(cfg, b.grid_dims)
@jax.jit
def ctx_dense(coords, counts, dims):
    sb = build_sparse_batch(coords, counts, dims, caps, **kw)
    return sb.levels[-1].count, sb.pools[0].parent.sum()

@jax.jit
def full_fp32(coords, counts, dims, feats):
    sb = build_sparse_batch(coords, counts, dims, caps, **kw)
    out = model.apply({"params": state.params, "buffers": state.buffers}, sb, feats, coords.astype(jnp.float32), True, grid_dims=b.grid_dims)
    return out.pred_class, out.pred_masks.sum(dtype=jnp.float32)

cfg16 = Config(); apply_overrides(cfg16, ["data.point_bucket_multiple=65536", "model.compute_dtype=bfloat16"])
model16 = make_model(cfg16)
@jax.jit
def full_bf16(coords, counts, dims, feats):
    sb = build_sparse_batch(coords, counts, dims, caps, **kw)
    out = model16.apply({"params": state.params, "buffers": state.buffers}, sb, feats, coords.astype(jnp.float32), True, grid_dims=b.grid_dims)
    return out.pred_class, out.pred_masks.sum(dtype=jnp.float32)

from mask3d_tpu.models.backbone import Res16UNet34C
bbp = state.params["backbone"]
def mk_bb(dt):
    mod = Res16UNet34C(in_channels=1, conv1_kernel_size=5, impl="dense", compute_dtype=dt)
    @jax.jit
    def f(coords, counts, dims, feats):
        sb = build_sparse_batch(coords, counts, dims, caps, **kw)
        out, _ = mod.apply({"params": bbp}, feats, sb, b.grid_dims)
        return out.sum(dtype=jnp.float32)
    return f

timed("ctx dense (pyramid+pools)", ctx_dense, b.coords, b.counts, b.dims)
timed("ctx+backbone dense fp32", mk_bb(None), b.coords, b.counts, b.dims, b.feats)
timed("ctx+backbone dense bf16", mk_bb(jnp.bfloat16), b.coords, b.counts, b.dims, b.feats)
timed("full eval dense fp32", full_fp32, b.coords, b.counts, b.dims, b.feats)
timed("full eval dense bf16", full_bf16, b.coords, b.counts, b.dims, b.feats)
