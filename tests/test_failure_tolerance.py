"""Failure tolerance + reference quirks (SURVEY.md §5 failure detection)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_corrupt_video_skipped_in_scan(tmp_path):
    """A garbage file with a video extension is skipped and counted as a
    failure (fingerprint.py:371-374 semantics), not a crash."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.inference.scanner import FingerprintScanner
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = tmp_path / "videos"
    make_corpus(d, num_unique=2, num_frames=20, duplicates=0)
    (d / "corrupt.mp4").write_bytes(b"\x00\x01garbage not a video\xff" * 100)

    model = create_model("attention")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, v["params"], v["batch_stats"],
                    {"model_type": "attention", "frame_size": 64, "max_frames": 32})
    sc = FingerprintScanner(str(ckpt), device="cpu", batch_size=2, buckets=(32,))
    fps = sc.scan_directory(d, num_workers=2)
    assert len(fps) == 2  # the two real videos
    from pathlib import Path as _P

    assert not any("corrupt" in _P(p).name for p in fps)


def test_corrupt_video_black_fallback_in_training(tmp_path):
    """Training degrades to black frames on decode failure
    (dataset.py:151-153 semantics)."""
    from video_fingerprint_tpu.data.dataset import VideoFingerprintDataset
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = tmp_path / "videos"
    make_corpus(d, num_unique=1, num_frames=16, duplicates=0)
    (d / "corrupt.mp4").write_bytes(b"nope" * 1000)

    ds = VideoFingerprintDataset(d, mode="train", model_type="attention",
                                 augment=False, cache_videos=False)
    corrupt_idx = next(
        i for i, s in enumerate(ds.samples) if "corrupt" in str(s["path"])
    )
    sample = ds.get(corrupt_idx, epoch=0)
    # black 480x640 fallback frames, resized to 64x64, still produce a clip
    assert sample["clip1"].shape[1:] == (64, 64, 3)
    assert sample["clip1"].max() == 0  # all-black


def test_attention_segment_averaging_quirk(monkeypatch, tmp_path):
    """When decode returns more frames than max_frames, the attention path
    averages 3 evenly-spaced segment embeddings WITHOUT re-normalizing
    (fingerprint.py:251-270) — quirk preserved."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.data import decode
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint
    from video_fingerprint_tpu.utils.synthetic import synthetic_frames

    model = create_model("attention")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, v["params"], v["batch_stats"],
                    {"model_type": "attention", "frame_size": 64, "max_frames": 16})
    sc = FingerprintScanner(str(ckpt), device="cpu", batch_size=2, buckets=(16,))

    frames = list(synthetic_frames(0, 40))  # > max_frames=16

    monkeypatch.setattr(decode, "decode_subsampled", lambda *a, **k: frames)
    emb = sc._extract_attention(tmp_path / "fake.mp4", num_segments=3)
    assert emb is not None

    # pin the exact semantics: mean over the 3 evenly-spaced segments'
    # embeddings, with NO re-normalization applied afterwards.
    from video_fingerprint_tpu.data import preprocess

    seg_len = min(16, len(frames) // 3)
    expected_segs = []
    for i in range(3):
        start = i * (len(frames) - seg_len) // 2
        clip = preprocess.preprocess_frames(frames[start : start + seg_len], 64)
        expected_segs.append(sc._embed_clip(clip))
    expected = np.mean(np.stack(expected_segs), axis=0)
    np.testing.assert_allclose(emb, expected, atol=1e-6)


def test_probe_systemic_failure_raises(tmp_path, monkeypatch):
    """Per-video probe failures degrade to exclusion (with a warning), but a
    systemic decode fault — every probe raising — must fail loudly instead of
    silently producing an empty/tiny 3D training index."""
    import pytest

    from video_fingerprint_tpu.data import dataset as ds_mod
    from video_fingerprint_tpu.data import decode

    d = tmp_path / "videos"
    d.mkdir()
    (d / "a.mp4").write_bytes(b"x")
    (d / "b.mp4").write_bytes(b"y")

    def broken_probe(path):
        raise RuntimeError("boom")

    monkeypatch.setattr(decode, "probe", broken_probe)
    with pytest.raises(RuntimeError, match="decode backend"):
        ds_mod.VideoFingerprintDataset(
            d, model_type="3d", clip_length=8, frame_stride=4
        )
