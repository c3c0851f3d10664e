"""Data-parallel Trainer + per-host dataset sharding on the 8-device mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = tmp_path_factory.mktemp("dp_videos")
    make_corpus(d, num_unique=8, num_frames=16, duplicates=0)
    return d


def test_trainer_dp_over_8_devices(corpus, tmp_path):
    """batch 8 over 8 CPU devices: one epoch trains, metrics finite."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer

    config = {
        "batch_size": 8,
        "epochs": 1,
        "learning_rate": 1e-3,
        "weight_decay": 1e-4,
        "frame_size": 64,
        "max_frames": 16,
        "clip_length": 16,
        "frame_stride": 4,
        "embedding_dim": 256,
        "spatial_dim": 128,
        "temporal_dim": 256,
        "num_attention_blocks": 4,
        "min_extract_ratio": 0.5,
        "patience": 10,
        "model_type": "attention",
        "device": "cpu",
        "seed": 0,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(corpus), batch_size=8, num_workers=0, max_frames=16,
        mode="train", model_type="attention",
    )
    val_loader = create_dataloader(
        str(corpus), batch_size=8, num_workers=0, max_frames=16,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, val_loader, config, tmp_path / "dp_run")
    assert trainer.dp.n == 8
    metrics = trainer.train_epoch()
    assert np.isfinite(metrics["loss"])
    # state is replicated across the mesh
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dataset_host_sharding(corpus):
    from video_fingerprint_tpu.data.dataset import VideoFingerprintDataset

    full = VideoFingerprintDataset(corpus, model_type="attention", mode="train")
    shards = [
        VideoFingerprintDataset(
            corpus, model_type="attention", mode="train",
            shard_index=i, shard_count=2,
        )
        for i in range(2)
    ]
    assert len(shards[0]) + len(shards[1]) == len(full)
    ids0 = {s["video_id"] for s in shards[0].samples}
    ids1 = {s["video_id"] for s in shards[1].samples}
    assert ids0.isdisjoint(ids1)


def test_uneven_devices_fall_back(corpus, tmp_path):
    """batch 6 on 8 devices -> largest divisor (6) used, still trains."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer

    config = {
        "batch_size": 6, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 16, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
        "spatial_dim": 128, "temporal_dim": 256, "num_attention_blocks": 4,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(corpus), batch_size=6, num_workers=0, max_frames=16,
        mode="train", model_type="attention",
    )
    trainer = Trainer(model, loader, loader, config, tmp_path / "dp_run6")
    assert trainer.dp.n == 6
