import time, numpy as np, jax, jax.numpy as jnp
from mask3d_tpu.config import Config, apply_overrides
from mask3d_tpu.data import VoxelizeCollate, make_synthetic_scene
from mask3d_tpu.sparse import build_sparse_batch
from mask3d_tpu.models.backbone import Res16UNet34C
from mask3d_tpu.train.loop import init_state, level_capacities

cfg = Config(); apply_overrides(cfg, ["data.point_bucket_multiple=65536"])
rng = np.random.default_rng(0)
items = [make_synthetic_scene(rng, 3, 2, 36, 18, 0.3, 0.2, True) for _ in range(4)]
host = VoxelizeCollate(point_bucket_multiple=65536)(items)
b = host.device
caps = level_capacities(cfg, b.coords.shape[1])
print("grid_cells:", b.grid_cells, flush=True)
t0=time.time(); state, model, _, _ = init_state(cfg, b); print(f"init: {time.time()-t0:.0f}s", flush=True)

def timed(name, fn, *args):
    t0 = time.perf_counter()
    r = fn(*args); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:30s} compile+1st {time.perf_counter()-t0:7.1f} s", flush=True)
    t0 = time.perf_counter(); r = fn(*args); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:30s} {(time.perf_counter()-t0)*1000:9.1f} ms", flush=True)

@jax.jit
def ctx_table(coords, counts, dims):
    sb = build_sparse_batch(coords, counts, dims, caps, conv1_kernel_size=5, grid_cells=b.grid_cells)
    return sum(i.sum() for i in sb.nbr_idx) + sb.nbr0_idx.sum()

bb = Res16UNet34C(in_channels=1, conv1_kernel_size=5)
bb16 = Res16UNet34C(in_channels=1, conv1_kernel_size=5, compute_dtype=jnp.bfloat16)
bbp = state.params["backbone"]
def make_bb(mod):
    @jax.jit
    def f(coords, counts, dims, feats):
        sb = build_sparse_batch(coords, counts, dims, caps, conv1_kernel_size=5, grid_cells=b.grid_cells)
        out, _ = mod.apply({"params": bbp}, feats, sb)
        return out.sum(dtype=jnp.float32)
    return f

@jax.jit
def full_eval(coords, counts, dims, feats):
    sb = build_sparse_batch(coords, counts, dims, caps, conv1_kernel_size=5, grid_cells=b.grid_cells)
    out = model.apply({"params": state.params, "buffers": state.buffers}, sb, feats, coords.astype(jnp.float32), True)
    return out.pred_class, out.pred_masks.sum(dtype=jnp.float32)

timed("ctx (table maps)", ctx_table, b.coords, b.counts, b.dims)
timed("ctx+backbone fp32", make_bb(bb), b.coords, b.counts, b.dims, b.feats)
timed("ctx+backbone bf16", make_bb(bb16), b.coords, b.counts, b.dims, b.feats)
timed("full eval fp32", full_eval, b.coords, b.counts, b.dims, b.feats)
