"""Typed config round-trip + validation."""

import pytest

from video_fingerprint_tpu.config import Config


def test_derived_lrs():
    c = Config(learning_rate=3e-4)
    assert c.lr_spatial == pytest.approx(3e-5)
    assert c.lr_attention == pytest.approx(1.5e-4)


def test_round_trip_preserves_unknown_keys():
    d = {"batch_size": 4, "model_type": "3d", "use_amp": True, "custom": [1, 2]}
    c = Config.from_dict(d)
    out = c.to_dict()
    assert out["batch_size"] == 4
    assert out["model_type"] == "3d"
    assert out["use_amp"] is True  # reference key preserved
    assert out["custom"] == [1, 2]


def test_validation():
    with pytest.raises(ValueError):
        Config(model_type="nope")
    with pytest.raises(ValueError):
        Config(min_extract_ratio=0.0)
    with pytest.raises(ValueError):
        Config(batch_size=0)


def test_reference_checkpoint_config_loads():
    """The exact key set the reference embeds (train.py:783-807)."""
    ref_cfg = {
        "batch_size": 8, "epochs": 50, "learning_rate": 1e-4,
        "lr_spatial": 1e-5, "lr_attention": 5e-5, "weight_decay": 1e-4,
        "frame_size": 64, "max_frames": 500, "clip_length": 128,
        "frame_stride": 32, "embedding_dim": 256, "spatial_dim": 128,
        "temporal_dim": 256, "num_attention_blocks": 4,
        "min_extract_ratio": 0.5, "use_amp": True, "patience": 10,
        "data_dir": "/data", "num_workers": 4, "model_type": "attention",
        "command_line": "train.py", "triplet_weight": 0.3,
        "triplet_margin": 0.3,
    }
    c = Config.from_dict(ref_cfg)
    d = c.to_dict()
    for k, v in ref_cfg.items():
        assert d[k] == v, k
