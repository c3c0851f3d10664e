"""Train CLI integration: 1-epoch run on a synthetic corpus, artifacts,
resume, and checkpoint -> scanner round-trip (the C21 L4->L5 contract)."""

import json

import pytest

from tests.conftest import REPO_ROOT

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = tmp_path_factory.mktemp("train_videos")
    make_corpus(d, num_unique=4, num_frames=20, duplicates=0)
    return d


@pytest.fixture(scope="module")
def run_dir(corpus, tmp_path_factory):
    import os

    from video_fingerprint_tpu.cli.train import main

    cwd = os.getcwd()
    work = tmp_path_factory.mktemp("work")
    os.chdir(work)
    try:
        rc = main([
            "--data_dir", str(corpus), "--batch_size", "2", "--epochs", "1",
            "--num_workers", "0", "--device", "cpu", "--max_frames", "24",
            "--run_name", "itest",
        ])
        assert rc == 0
        yield work / "runs" / "itest"
    finally:
        os.chdir(cwd)


def test_artifacts(run_dir):
    assert (run_dir / "config.json").exists()
    assert (run_dir / "training_info.txt").exists()
    assert (run_dir / "training_log.txt").exists()
    assert (run_dir / "training_summary.txt").exists()
    ckpts = run_dir / "checkpoints"
    assert (ckpts / "last.ckpt").exists()
    assert (ckpts / "best.ckpt").exists()
    assert (ckpts / "epoch_0.ckpt").exists()
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["model_type"] == "attention"
    log = (run_dir / "training_log.txt").read_text()
    assert "AUC-ROC" in log and "    0 |" in log


def test_checkpoint_embeds_config_and_counters(run_dir):
    from video_fingerprint_tpu.training.checkpoint import load_checkpoint

    payload = load_checkpoint(run_dir / "checkpoints" / "last.ckpt")
    assert payload["config"]["model_type"] == "attention"
    assert payload["train"]["epoch"] == 0
    assert payload["train"]["global_step"] > 0
    assert "opt_state" in payload["train"] and payload["train"]["opt_state"]


def test_resume_restores_counters(run_dir, corpus, tmp_path):
    import jax

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import load_checkpoint
    from video_fingerprint_tpu.training.trainer import Trainer

    payload = load_checkpoint(run_dir / "checkpoints" / "last.ckpt")
    config = dict(payload["config"])
    config["epochs"] = 2

    model = create_model("attention")
    loader = create_dataloader(
        str(corpus), batch_size=2, num_workers=0, max_frames=24,
        mode="train", model_type="attention",
    )
    val_loader = create_dataloader(
        str(corpus), batch_size=2, num_workers=0, max_frames=24,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, val_loader, config, tmp_path / "resume_run")
    trainer.resume(run_dir / "checkpoints" / "last.ckpt")
    assert trainer.epoch == 1
    assert trainer.global_step == payload["train"]["global_step"]
    assert int(trainer.state.step) == trainer.global_step


def test_scanner_loads_trained_checkpoint(run_dir, corpus):
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    sc = FingerprintScanner(
        str(run_dir / "checkpoints" / "best.ckpt"), device="cpu", batch_size=2,
        buckets=(24,),
    )
    fps = sc.scan_directory(corpus, num_workers=1)
    assert len(fps) == 4
    for meta in fps.values():
        assert abs(meta["embedding_norm"] - 1.0) < 1e-3


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend: save -> load_any -> scanner-compatible variables."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import (
        load_any,
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    model = create_model("attention")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    config = {"model_type": "attention", "frame_size": 64, "max_frames": 100}
    path = tmp_path / "orbax_ckpt"
    save_checkpoint_orbax(
        path, variables["params"], variables["batch_stats"], config,
        epoch=4, global_step=17, bests={"best_auc_roc": 0.7},
    )
    assert path.is_dir()

    payload = load_checkpoint_orbax(path)
    assert payload["config"]["max_frames"] == 100
    assert payload["train"]["epoch"] == 4
    assert payload["train"]["bests"]["best_auc_roc"] == pytest.approx(0.7)

    loaded_vars, cfg = load_any(path)
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 6, 64, 64, 3))
    a = model.apply(variables, video)
    b = model.apply(loaded_vars, video)
    import numpy as np
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
