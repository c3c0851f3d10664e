"""Regressions for code-review findings (round-1 self-review)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_eval_step_3d_model_no_mask_crash():
    """3D eval used to crash: eval_step passed mask= to a model without it."""
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.train_step import make_eval_step

    model = create_model("3d", frame_stride=4)
    B, T, hw = 2, 8, 32
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, hw, hw, 3)))
    eval_step = jax.jit(make_eval_step(model, "3d"))
    batch = {
        "clip1": jax.random.uniform(jax.random.PRNGKey(1), (B, T, hw, hw, 3)),
        "clip2": jax.random.uniform(jax.random.PRNGKey(2), (B, T, hw, hw, 3)),
        "mask1": jnp.ones((B, T), bool),
        "mask2": jnp.ones((B, T), bool),
    }
    out, emb1, emb2 = eval_step(
        variables["params"], variables["batch_stats"], batch, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(out["loss"]))


def test_extracts_never_all_padding():
    """A short clip in a large bucket must still yield extracts overlapping
    real frames (start clamped to true length)."""
    from video_fingerprint_tpu.training.train_step import (
        sample_extract_lengths,
        sample_extracts,
    )

    B, T = 4, 64
    true_lengths = jnp.asarray([4, 8, 16, 64])
    m = jnp.arange(T)[None, :] < true_lengths[:, None]
    video = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :, None, None, None],
        (B, T, 2, 2, 3),
    )
    for seed in range(8):
        rng = jax.random.PRNGKey(seed)
        k_len, k_ex = jax.random.split(rng)
        lengths = sample_extract_lengths(k_len, B, T, 0.5)
        _, exm, idx = sample_extracts(k_ex, video, lengths, jnp.sum(m, axis=1))
        effective = exm & jnp.take_along_axis(m, idx, axis=1)
        # every sample has at least one real frame in its extract
        assert bool(jnp.all(jnp.sum(effective, axis=1) > 0)), seed


@pytest.mark.slow
def test_train_step_mixed_lengths_finite():
    """End-to-end: mixed-length masked batch produces finite loss/grads."""
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.optim import make_optimizer
    from video_fingerprint_tpu.training.train_step import (
        init_train_state,
        make_train_step,
    )

    model = create_model("attention")
    B, T, hw = 4, 32, 32
    state = init_train_state(model, None, jax.random.PRNGKey(0), (1, 8, hw, hw, 3))
    tx = make_optimizer("attention", state.params, 1e-3, total_steps=10)
    state = state.replace(opt_state=tx.init(state.params))
    step = jax.jit(make_train_step(model, tx, "attention"))

    true_lengths = np.asarray([3, 8, 20, 32])
    mask = np.arange(T)[None, :] < true_lengths[:, None]
    clip = (np.random.default_rng(0).random((B, T, hw, hw, 3)) * 255).astype(np.uint8)
    clip = clip * mask[:, :, None, None, None]
    batch = {
        "clip1": jnp.asarray(clip),
        "clip2": jnp.asarray(clip),
        "video_id": jnp.arange(B),
        "mask1": jnp.asarray(mask),
        "mask2": jnp.asarray(mask),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_temporal_conv_block_validates_kernel_count():
    from video_fingerprint_tpu.models.layers import TemporalConvBlock

    block = TemporalConvBlock(dim=256, kernel_sizes=(3, 5, 7))
    with pytest.raises(ValueError, match="must divide"):
        block.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 256)))


@pytest.mark.slow
def test_validate_partial_batch_multi_device(tmp_path):
    """Val loader's trailing partial batch on a multi-device mesh."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=5, num_frames=16, duplicates=0)
    config = {
        "batch_size": 4, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 16, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
        "spatial_dim": 128, "temporal_dim": 256, "num_attention_blocks": 4,
    }
    model = create_model("attention")
    train_loader = create_dataloader(
        str(tmp_path / "v"), batch_size=4, num_workers=0, max_frames=16,
        mode="train", model_type="attention",
    )
    # 5 samples, batch 4, drop_last=False in val -> final batch of 1 row
    val_loader = create_dataloader(
        str(tmp_path / "v"), batch_size=4, num_workers=0, max_frames=16,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, train_loader, val_loader, config, tmp_path / "run")
    assert trainer.dp.n == 4
    metrics = trainer.validate()
    assert np.isfinite(metrics["loss"])
    assert "auc_roc" in metrics


@pytest.mark.slow
def test_extract_robustness_uses_true_lengths(tmp_path):
    """Robustness extracts must window each sample's TRUE length: a short
    video padded into a long bucket previously got an all-padding extract
    (degenerate embedding) because the center slice used the padded T."""
    import jax.numpy as jnp

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=4, num_frames=16, duplicates=0)
    config = {
        "batch_size": 2, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 64, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
        "spatial_dim": 128, "temporal_dim": 256, "num_attention_blocks": 4,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(tmp_path / "v"), batch_size=2, num_workers=0, max_frames=64,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, loader, config, tmp_path / "run")

    rng = np.random.default_rng(0)
    T = 64
    clip = jnp.asarray(rng.random((2, T, 64, 64, 3), dtype=np.float32))
    mask = np.zeros((2, T), bool)
    mask[0, :12] = True   # short video padded into the 64 bucket
    mask[1, :] = True
    mask = jnp.asarray(mask)

    metrics = trainer._extract_robustness([(clip, mask, 2, 2)])

    # oracle: per-sample true-length center extracts, forwarded unpadded
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    import jax

    fwd = jax.jit(lambda x, m: model.apply(variables, x, mask=m))
    emb_full = np.asarray(fwd(clip, mask))
    coss = []
    for b, t_true in ((0, 12), (1, 64)):
        ext = max(1, int(t_true * 0.5))
        start = (t_true - ext) // 2
        sub = clip[b : b + 1, start : start + ext]
        emb = np.asarray(fwd(sub, jnp.ones((1, ext), bool)))[0]
        coss.append(float(np.dot(emb_full[b], emb)))
    np.testing.assert_allclose(
        metrics["extract_sim_50"], np.mean(coss), atol=1e-4
    )


@pytest.mark.slow
def test_extract_robustness_excludes_padded_rows(tmp_path):
    """VERDICT r4 weak #2: on a partial final val batch the wraparound-
    duplicated pad rows must NOT enter the robustness mean (they would
    double-count their source rows). The metric over a padded batch
    (padded_b=4, true_b=3, row 3 = wraparound copy of row 0) must equal the
    unpadded computation over the 3 valid rows."""
    import jax.numpy as jnp

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=4, num_frames=16, duplicates=0)
    config = {
        "batch_size": 4, "epochs": 1, "learning_rate": 1e-3,
        "frame_size": 64, "max_frames": 16, "clip_length": 16,
        "frame_stride": 4, "embedding_dim": 256, "min_extract_ratio": 0.5,
        "model_type": "attention", "device": "cpu", "seed": 0,
        "spatial_dim": 128, "temporal_dim": 256, "num_attention_blocks": 4,
    }
    model = create_model("attention")
    loader = create_dataloader(
        str(tmp_path / "v"), batch_size=4, num_workers=0, max_frames=16,
        mode="val", model_type="attention",
    )
    trainer = Trainer(model, loader, loader, config, tmp_path / "run")

    rng = np.random.default_rng(3)
    T = 16
    clip = rng.random((4, T, 64, 64, 3), dtype=np.float32)
    clip[3] = clip[0]  # wraparound pad row duplicates row 0
    mask = np.ones((4, T), bool)
    mask[1, 10:] = False  # mixed true lengths among the valid rows
    clip, mask = jnp.asarray(clip), jnp.asarray(mask)

    padded = trainer._extract_robustness([(clip, mask, 4, 3)])
    unpadded = trainer._extract_robustness([(clip[:3], mask[:3], 3, 3)])
    for k in padded:
        np.testing.assert_allclose(padded[k], unpadded[k], atol=1e-6,
                                    err_msg=k)
