"""Scale-up training rehearsal on the real chip.

Runs a few hundred steps of the flagship config (Mask3D + Res16UNet34C,
reference batch 16 via gradient accumulation) on realistic multi-floor
synthetic scenes (~45k voxels, 12 rooms, two floors) through the FULL trainer —
fit -> periodic validation -> checkpointing — then asserts:

- train loss decreases (first-epoch mean vs last-epoch mean),
- final val mAP@50 clears a fixed bound,
- the last checkpoint restores bit-exact into a fresh trainer,

and prints steps/sec. This is the closest available proxy for the
reference's mAP-parity acceptance (BASELINE.md north star) without the
Structured3D dataset on disk.

Run: python tools/train_rehearsal.py [num_epochs]
(600 epochs = 1800 steps, ~1.5-2 h on v5e incl. compiles and evals;
ONE TPU process at a time. The dice term needs ~1k steps to leave the
all-negative-mask regime — shorter runs plateau with mAP@50 = 0.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class SyntheticRoomsDataset:
    """Fixed-seed multi-floor room scenes in the dataset item contract."""

    labels_info = {0: {"name": "is_room", "validation": True}}

    # Scene-shape mixture matched to the reference dataset statistics
    # (BASELINE.md: 1-22 rooms/scene, avg 6.23): (nx, ny, multi_floor)
    # with sampling weights; rooms = nx*ny*(2 if multi_floor else 1).
    # Mixture mean = 6.22 rooms; range 1-18 (<= num_queries 25 with the
    # matcher slack that 24-room scenes were measured to lack).
    _CONFIGS = [
        ((1, 1, False), 0.10),   # 1 room
        ((2, 1, False), 0.16),   # 2
        ((2, 2, False), 0.22),   # 4
        ((3, 2, False), 0.22),   # 6
        ((2, 2, True), 0.12),    # 8
        ((3, 2, True), 0.10),    # 12
        ((3, 3, True), 0.06),    # 18
        ((4, 3, False), 0.02),   # 12
    ]

    def __init__(self, n_scenes: int, seed: int):
        from mask3d_tpu.data import make_synthetic_scene

        rng = np.random.default_rng(seed)
        self._items = []
        probs = np.array([w for _, w in self._CONFIGS])
        probs = probs / probs.sum()
        for i in range(n_scenes):
            (nx, ny, mf) = self._CONFIGS[
                rng.choice(len(self._CONFIGS), p=probs)
            ][0]
            # room_size varies so point counts span the dataset's range
            # (downsampled Structured3D scenes average ~47k pts); cap the
            # size of room-heavy scenes so every scene fits the 65536
            # point bucket (one executable, one memory budget).
            rooms = nx * ny * (2 if mf else 1)
            hi = min(45, 29 + int(17 * np.sqrt(8.0 / max(rooms, 8))))
            size = int(rng.integers(28, hi))
            item = make_synthetic_scene(
                rng, num_rooms_x=nx, num_rooms_y=ny, room_size=size,
                height=14, jitter=0.3, dropout=0.25, multi_floor=mf,
            )
            item["scene"] = f"synthetic_{seed}_{i}"
            item["idx"] = i
            self._items.append(item)

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i):
        return self._items[i]


def main(num_epochs: int = 60):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu"
        if jax.default_backend() == "tpu" else "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mask3d_tpu.config import Config, apply_overrides
    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer

    cfg = Config()
    apply_overrides(cfg, [
        "data.batch_size=16",
        # batch 16 on one 16GB chip; micro-batch 2 (accum 8): the
        # reference-matched scene mixture pins a (152, 112, 32)-scale L0
        # grid and micro-batch 4 compiled to 15.90G > 15.75G HBM.
        "trainer.grad_accum_steps=8",
        "model.remat_backbone=true",
        "data.point_bucket_multiple=65536",
        # The reference trains ~100k steps at lr 1e-4; this rehearsal has
        # a couple thousand, so scale lr moderately (1e-3 measured to
        # stall the dice term; 3e-4 moves it).
        "optimizer.lr=0.0003",
        f"trainer.max_epochs={num_epochs}",
        "trainer.check_val_every_n_epoch=50",
        # 3-step epochs: the 475 MB full-state write would dominate epoch
        # wall time (~25 of 37.6 s/epoch measured) — save every 10.
        "trainer.save_last_every_n_epochs=10",
        "trainer.log_every_n_steps=3",
        "trainer.train_split_metrics=false",  # throughput: metrics on val
        "general.use_dbscan=false",           # eval speed (not under test)
        "general.scores_threshold=0.0",
        "general.export_las=false",
        "general.save_dir=/tmp/rehearsal_saved",
        "general.experiment_name=rehearsal",
        "general.experiment_id=run1",
    ])
    datasets = {
        "train": SyntheticRoomsDataset(48, seed=1),
        "validation": SyntheticRoomsDataset(8, seed=2),
        "test": SyntheticRoomsDataset(8, seed=3),
    }
    # Mixed-size scenes (BASELINE.md room-count distribution): pin ONE
    # level-0 grid shape across all batches via the collator's grid
    # floor, so the whole run compiles each of train/eval exactly once.
    from mask3d_tpu.data.collate import voxelize_item

    max_dims = np.zeros(3, np.int64)
    n_rooms, n_pts = [], []
    for split in datasets.values():
        for item in split:
            _, _, dims = voxelize_item(item["coordinates"])
            max_dims = np.maximum(max_dims, np.asarray(dims, np.int64))
            n_rooms.append(len(np.unique(item["labels"][:, 1])))
            n_pts.append(len(item["coordinates"]))
    cfg.data.min_grid_dims = tuple(int(-(-int(d) // 8) * 8)
                                   for d in max_dims)
    print(f"scene mixture: rooms min/avg/max = {min(n_rooms)}/"
          f"{np.mean(n_rooms):.2f}/{max(n_rooms)} "
          f"(reference: 1/6.23/22), pts avg {np.mean(n_pts):.0f}; "
          f"pinned grid {cfg.data.min_grid_dims}; {num_epochs} epochs x 3 "
          f"steps (dice needs ~1k+ steps to leave the all-negative regime)",
          flush=True)

    import shutil

    if "--fresh" in sys.argv or not os.path.exists(
        "/tmp/rehearsal_saved/rehearsal/run1/last-epoch.ckpt"
    ):
        shutil.rmtree("/tmp/rehearsal_saved", ignore_errors=True)
    # else: the trainer auto-resumes from last-epoch.ckpt (a wedged
    # tunnel RPC should not cost the run — kill and relaunch).
    trainer = InstanceSegmentationTrainer(cfg, datasets=datasets)

    t0 = time.time()
    trainer.fit()
    wall = time.time() - t0
    steps = int(np.asarray(trainer.state.step))
    print(f"total steps: {steps}  wall: {wall:.0f}s  "
          f"({steps / wall:.3f} steps/s incl. compile+eval)", flush=True)

    # loss decreased?
    import csv

    with open(os.path.join(trainer.run_dir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    tr = [(int(r["epoch"]), float(r["train_loss"]))
          for r in rows if r.get("train_loss")]
    first, last = tr[0][1], tr[-1][1]
    print(f"train_loss: epoch {tr[0][0]} {first:.2f} -> "
          f"epoch {tr[-1][0]} {last:.2f}", flush=True)
    assert last < 0.7 * first, "train loss did not decrease enough"

    vals = [float(r["val_mean_ap_50"]) for r in rows
            if r.get("val_mean_ap_50")]
    print(f"val mAP@50 trajectory: {[round(v, 3) for v in vals]}", flush=True)
    assert vals and vals[-1] >= 0.15, f"final val mAP@50 too low: {vals}"

    # bit-exact resume of the last checkpoint
    import jax as _jax
    from mask3d_tpu.train import checkpoint as ckpt

    fresh = InstanceSegmentationTrainer(cfg, datasets=datasets)
    restored, _ = ckpt.load_checkpoint(
        fresh.ckpt_mgr.resume_path(), fresh.state
    )
    for a, b in zip(
        _jax.tree_util.tree_leaves(trainer.state.params),
        _jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("checkpoint restores bit-exact", flush=True)
    print("REHEARSAL PASS", flush=True)


if __name__ == "__main__":
    # Record ownership of the (single-process) TPU tunnel; bench.py stops
    # a still-running rehearsal by this exact pid before benching.
    with open("/tmp/rehearsal.pid", "w") as f:
        f.write(str(os.getpid()))
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
