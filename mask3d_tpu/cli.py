"""Entry point: train / test with Hydra-style override strings.

Rebuild of `mask3d/main_instance_segmentation.py` (M1): seeds, run directory,
auto-resume, checkpoint surgery, then train or test. CLI grammar matches the
reference experiment launch scripts (`mask3d/experiment_launch_scripts/*.sh`):

    python -m mask3d_tpu.cli train \
        general.experiment_name="experiment1_voxel_size_150" \
        data.rasterization_factor=150 trainer.max_epochs=30

    python -m mask3d_tpu.cli test \
        general.checkpoint="saved/.../best_val_mean_ap_50.ckpt" \
        data.test_batch_size=1 general.filter_out_instances=true
"""

from __future__ import annotations

import logging
import random
import sys

import numpy as np


def seed_everything(seed: int):
    """Reference `seed_everything` (`main_instance_segmentation.py:35`)."""
    random.seed(seed)
    np.random.seed(seed)


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    # Two invocation grammars:
    # - explicit subcommand: `python -m mask3d_tpu.cli train a.b=c ...`
    # - reference-script style (no subcommand, all args are Hydra
    #   overrides; `general.train_mode=false` selects test — reference
    #   `main_instance_segmentation.py:100-113`).
    if argv[0] in ("train", "test"):
        command, *overrides = argv
    else:
        command, overrides = None, argv

    from mask3d_tpu.config import Config, apply_overrides
    from mask3d_tpu.train.trainer import InstanceSegmentationTrainer

    cfg = Config()
    apply_overrides(cfg, overrides)
    if command is None:
        command = "train" if cfg.general.train_mode else "test"
    cfg.general.train_mode = command == "train"
    seed_everything(cfg.general.seed)

    # Multi-host wiring (no-op unless trainer.distributed=true): must run
    # before any other jax call so jax.devices() is the global list.
    from mask3d_tpu.parallel import dist

    dist.maybe_initialize(cfg)

    # Persistent compilation cache: the flagship train/eval steps compile
    # in minutes on remote/tunneled TPU backends; cached reloads take
    # seconds. Override the location with MASK3D_COMPILE_CACHE.
    import os

    import jax

    # Record this process as the TPU-tunnel owner (one TPU process at a
    # time — see .claude/skills/verify/SKILL.md). bench.py SIGTERMs this
    # pid at startup to take the tunnel exclusively; the trainer's SIGTERM
    # handler writes last-epoch.ckpt first, so auto-resume replays at most
    # the interrupted epoch.
    if jax.default_backend() == "tpu":
        try:
            with open("/tmp/rehearsal.pid", "w") as f:
                f.write(str(os.getpid()))
        except OSError:
            pass
        else:
            # Clean-exit removal so a recycled pid can never be signalled
            # by a later bench run (bench.py also verifies the cmdline).
            import atexit

            def _drop_pidfile(pid=os.getpid()):
                try:
                    with open("/tmp/rehearsal.pid") as f:
                        if int(f.read().strip()) == pid:
                            os.remove("/tmp/rehearsal.pid")
                except (OSError, ValueError):
                    pass

            atexit.register(_drop_pidfile)

    cache = os.environ.get("MASK3D_COMPILE_CACHE")
    if cache is None:
        suffix = (
            ".jax_cache_tpu" if jax.default_backend() == "tpu"
            else ".jax_cache"
        )
        cache = os.path.join(os.getcwd(), suffix)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    trainer = InstanceSegmentationTrainer(cfg)
    if command == "train":
        trainer.fit()
    else:
        metrics = trainer.test()
        for k, v in sorted(metrics.items()):
            print(f"{k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
