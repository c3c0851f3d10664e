"""Reference .pth checkpoints: direct load in the scanner + CLI converter."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

torch = pytest.importorskip("torch")
REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout unavailable"
)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """A reference-format checkpoint (train.py:538-550 layout) built by
    running the reference model."""
    sys.path.insert(0, str(REFERENCE))
    import model as ref

    torch.manual_seed(7)
    m = ref.create_model("attention")
    m.eval()
    config = {
        "model_type": "attention",
        "frame_size": 64,
        "max_frames": 500,
        "embedding_dim": 256,
        "spatial_dim": 128,
        "temporal_dim": 256,
        "num_attention_blocks": 4,
    }
    ckpt = {
        "epoch": 3,
        "global_step": 42,
        "model_state_dict": m.state_dict(),
        "config": config,
        "best_auc_roc": 0.9,
        "best_val_loss": 0.5,
        "best_val_acc": 0.8,
    }
    path = tmp_path_factory.mktemp("pth") / "ref.pth"
    torch.save(ckpt, path)

    video = torch.rand(1, 12, 3, 64, 64)
    with torch.no_grad():
        emb = m(video).numpy()
    return path, video.numpy(), emb


def test_scanner_loads_pth_directly(torch_ckpt):
    import jax.numpy as jnp

    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    path, video, ref_emb = torch_ckpt
    sc = FingerprintScanner(str(path), device="cpu")
    ours = np.asarray(
        sc._fwd(sc.variables, jnp.asarray(video).transpose(0, 1, 3, 4, 2))
    )
    cos = float(np.sum(ours * ref_emb) / (np.linalg.norm(ours) * np.linalg.norm(ref_emb)))
    assert cos > 0.9999, cos


@pytest.mark.slow
def test_convert_cli_roundtrip(torch_ckpt, tmp_path):
    import jax.numpy as jnp

    path, video, ref_emb = torch_ckpt
    out = tmp_path / "converted.ckpt"
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "convert_checkpoint.py"),
         str(path), str(out)],
        check=True, capture_output=True, timeout=300,
    )
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner
    from video_fingerprint_tpu.training.checkpoint import load_checkpoint

    payload = load_checkpoint(out)
    assert payload["train"]["epoch"] == 3
    assert payload["train"]["global_step"] == 42
    assert payload["train"]["bests"]["best_auc_roc"] == pytest.approx(0.9)
    assert payload["config"]["model_type"] == "attention"

    sc = FingerprintScanner(str(out), device="cpu")
    ours = np.asarray(
        sc._fwd(sc.variables, jnp.asarray(video).transpose(0, 1, 3, 4, 2))
    )
    cos = float(np.sum(ours * ref_emb) / (np.linalg.norm(ours) * np.linalg.norm(ref_emb)))
    assert cos > 0.9999, cos


def test_export_roundtrip_to_reference(tmp_path):
    """Our .ckpt -> reference .pth: the ORIGINAL torch model must load the
    exported state_dict (strict) and agree to cosine > 0.9999."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint
    from video_fingerprint_tpu.utils.torch_compat import (
        attention_variables_to_state_dict,
    )

    model = create_model("attention")
    variables = model.init(jax.random.PRNGKey(11), jnp.zeros((1, 4, 64, 64, 3)))
    sd_np = attention_variables_to_state_dict(variables)

    sys.path.insert(0, str(REFERENCE))
    import model as ref

    m = ref.create_model("attention")
    sd = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    # strict: the export must cover EVERY reference key, including the
    # persistent pos_encoding.pe buffer (fingerprint.py:70 loads strict).
    m.load_state_dict(sd, strict=True)
    m.eval()

    video = np.random.default_rng(3).random((1, 12, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_emb = m(torch.from_numpy(video)).numpy()
    ours = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(video).transpose(0, 1, 3, 4, 2))
    )
    cos = float(np.sum(ours * ref_emb) / (np.linalg.norm(ours) * np.linalg.norm(ref_emb)))
    assert cos > 0.9999, cos


def test_export_cli(tmp_path):
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint

    model = create_model("attention")
    variables = model.init(jax.random.PRNGKey(12), jnp.zeros((1, 4, 64, 64, 3)))
    src = tmp_path / "ours.ckpt"
    save_checkpoint(src, variables["params"], variables["batch_stats"],
                    {"model_type": "attention", "embedding_dim": 256},
                    epoch=2, global_step=7)
    dst = tmp_path / "exported.pth"
    subprocess.run(
        [sys.executable, str(REPO_ROOT / "tools" / "export_torch_checkpoint.py"),
         str(src), str(dst)],
        check=True, capture_output=True, timeout=300,
    )
    ckpt = torch.load(dst, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 2 and ckpt["global_step"] == 7
    assert ckpt["config"]["model_type"] == "attention"
    assert "spatial_encoder.encoder.0.weight" in ckpt["model_state_dict"]
    assert ckpt["model_state_dict"]["pos_encoding.pe"].shape == (1, 10000, 256)


def test_export_3d_roundtrip_to_reference():
    """3D model: our variables load strict into the ORIGINAL torch model and
    agree to cosine > 0.9999."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.utils.torch_compat import variables_to_state_dict

    model = create_model("3d", frame_stride=16)
    variables = model.init(jax.random.PRNGKey(21), jnp.zeros((1, 16, 64, 64, 3)))
    sd_np = variables_to_state_dict(variables, "3d")

    sys.path.insert(0, str(REFERENCE))
    import model as ref

    m = ref.create_model("3d", frame_stride=16)
    # strict=True raises on any mismatch; assert the report is empty too.
    result = m.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}, strict=True
    )
    assert not result.missing_keys and not result.unexpected_keys
    m.eval()

    video = np.random.default_rng(5).random((1, 48, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_emb = m(torch.from_numpy(video)).numpy()
    ours = np.asarray(
        jax.jit(model.apply)(variables, jnp.asarray(video).transpose(0, 1, 3, 4, 2))
    )
    cos = float(np.sum(ours * ref_emb) / (np.linalg.norm(ours) * np.linalg.norm(ref_emb)))
    assert cos > 0.9999, cos


def test_trainer_warm_start_from_pth(torch_ckpt, tmp_path):
    """`--checkpoint model.pth` warm-starts training from a reference torch
    checkpoint: weights loaded, optimizer/schedule/counters fresh (torch
    AdamW state does not transfer to optax — docs/MIGRATION.md)."""
    import jax

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training import checkpoint as ckpt_mod
    from video_fingerprint_tpu.training.trainer import Trainer
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    path, _, _ = torch_ckpt
    make_corpus(tmp_path / "v", num_unique=4, num_frames=16, duplicates=0)
    config = {
        "batch_size": 2, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 16, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
        "spatial_dim": 128, "temporal_dim": 256, "num_attention_blocks": 4,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(tmp_path / "v"), batch_size=2, num_workers=0, max_frames=16,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, loader, config, tmp_path / "run")
    trainer.resume(str(path))

    want, _ = ckpt_mod.load_any(path)
    got = jax.device_get(trainer.state.params)
    leaves_w = jax.tree_util.tree_leaves(want["params"])
    leaves_g = jax.tree_util.tree_leaves(got)
    assert len(leaves_w) == len(leaves_g)
    for a, b in zip(leaves_w, leaves_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # counters and schedule start fresh: the .pth's epoch=3/step=42 ignored
    assert trainer.epoch == 0
    assert int(jax.device_get(trainer.state.step)) == 0


def test_trainer_resume_rejects_wrong_model_type(torch_ckpt, tmp_path):
    """Resuming/warm-starting from a checkpoint of the OTHER architecture
    must fail loudly at resume time with a clear message, not at the first
    jitted step inside XLA (trainer._check_ckpt_model_type)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint
    from video_fingerprint_tpu.training.trainer import Trainer
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=4, num_frames=16, duplicates=0)
    config = {
        "batch_size": 2, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 16, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(tmp_path / "v"), batch_size=2, num_workers=0, max_frames=16,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, loader, config, tmp_path / "run")

    m3d = create_model("3d")
    v3d = m3d.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 64, 64, 3), jnp.float32))
    bad = tmp_path / "wrong.ckpt"
    save_checkpoint(bad, v3d["params"], v3d["batch_stats"],
                    {"model_type": "3d", "frame_size": 64})
    with pytest.raises(ValueError, match="model_type"):
        trainer.resume(str(bad))
