"""Config override grammar: field overrides + Hydra group selections
(reference CLI grammar, `mask3d/main_instance_segmentation.py:100-113` +
`experiment_launch_scripts/*.sh`)."""

import pytest

from mask3d_tpu.config import Config, apply_overrides


def test_field_overrides():
    cfg = Config()
    apply_overrides(cfg, [
        "data.rasterization_factor=100",
        "general.train_mode=false",
        "model.sample_sizes=[1,2,3]",
        "data.valid_scenes_file_path=null",
    ])
    assert cfg.data.rasterization_factor == 100
    assert cfg.general.train_mode is False
    assert cfg.model.sample_sizes == (1, 2, 3)
    assert cfg.data.valid_scenes_file_path is None


def test_group_select_structured3d():
    cfg = Config()
    apply_overrides(cfg, ["data/datasets=structured3d_room_detection"])
    assert cfg.data.dataset == "structured3d"
    assert cfg.data.filter_out_classes == (0, 17, 18, 19, 21)
    assert cfg.data.volume_augmentations == "stru3d"
    assert cfg.data.valid_scenes_file_path.endswith(
        "structured3d_valid_scenes_class21.txt"
    )


def test_group_select_matterport_trainval():
    cfg = Config()
    apply_overrides(cfg, ["data/datasets=matterport3d_room_detection"])
    assert cfg.data.dataset == "matterport3d"
    assert cfg.data.train_dataset_mode == "trainval"
    assert cfg.data.validation_dataset_mode == "test"
    assert cfg.data.filter_out_classes == ()


def test_group_select_then_field_override_wins():
    cfg = Config()
    apply_overrides(cfg, [
        "data/datasets=s3dis_room_detection",
        "data.data_root=/tmp/elsewhere",
    ])
    assert cfg.data.dataset == "s3dis"
    assert cfg.data.data_root == "/tmp/elsewhere"


def test_unknown_group_and_key_raise():
    cfg = Config()
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["data/nonexistent=x"])
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["data/datasets=not_a_dataset"])
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["data.not_a_field=1"])


def test_reference_script_style_cli_dispatch(monkeypatch):
    """`general.train_mode=false` without a subcommand selects test mode
    (cli parses reference launch-script invocations verbatim)."""
    import mask3d_tpu.cli as cli

    captured = {}

    class FakeTrainer:
        def __init__(self, cfg):
            captured["cfg"] = cfg

        def fit(self):
            captured["ran"] = "fit"

        def test(self):
            captured["ran"] = "test"
            return {}

    monkeypatch.setattr(
        "mask3d_tpu.train.trainer.InstanceSegmentationTrainer", FakeTrainer
    )
    cli.main([
        "general.train_mode=false",
        "general.experiment_name=exp5",
        "data.test_batch_size=1",
    ])
    assert captured["ran"] == "test"
    assert captured["cfg"].data.test_batch_size == 1
    cli.main(["general.experiment_name=exp1"])
    assert captured["ran"] == "fit"
