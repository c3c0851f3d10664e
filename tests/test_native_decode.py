"""Native C++ decode worker vs the cv2 reference path."""

import numpy as np
import pytest

from video_fingerprint_tpu.utils import native_decode as nd

pytestmark = pytest.mark.skipif(
    not nd.available(), reason="libav toolchain unavailable"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    from video_fingerprint_tpu.utils.synthetic import synthetic_frames, write_video

    p = tmp_path_factory.mktemp("nd") / "v.mp4"
    write_video(p, synthetic_frames(3, 50, height=96, width=150))
    return p


def test_probe_matches_cv2(video):
    from video_fingerprint_tpu.data import decode

    total, fps, w, h = nd.probe(video)
    ref = decode.probe(video)
    assert total == ref.total_frames
    assert fps == pytest.approx(ref.fps)
    assert (w, h) == (ref.width, ref.height)


def test_decode_scan_matches_cv2_path(video):
    from video_fingerprint_tpu.data import decode, preprocess

    ours = nd.decode_scan(video, 40, 64)
    frames = decode.decode_subsampled(video, 40)
    ref = preprocess.preprocess_frames(frames, 64, normalize=False)
    assert ours.shape == ref.shape
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()  # same codec; swscale vs cv2 rounding


def test_decode_scan_respects_skip(video):
    a = nd.decode_scan(video, 100, 64, skip_rate=1)
    b = nd.decode_scan(video, 100, 64, skip_rate=5)
    assert a.shape[0] == 50
    assert b.shape[0] == 10
    np.testing.assert_array_equal(b[0], a[0])
    np.testing.assert_array_equal(b[1], a[5])


def test_decode_clip_window(video):
    clip = nd.decode_clip(video, 10, 16, 64)
    assert clip.shape == (16, 64, 64, 3)
    # beyond-end window repeat-pads
    tail = nd.decode_clip(video, 45, 16, 64)
    assert tail.shape == (16, 64, 64, 3)
    np.testing.assert_array_equal(tail[-1], tail[5])  # padded tail repeats


def test_corrupt_file_returns_none(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"junk" * 100)
    assert nd.decode_scan(bad, 10, 64) is None
    assert nd.probe(bad) is None


def test_eval_loader_native_matches_cv2(tmp_path):
    """decode_backend='native' val loader produces the same clips as cv2
    (swscale-vs-cv2 rounding tolerance), same masks/ids/order."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=3, num_frames=40, duplicates=0)
    mk = lambda backend: create_dataloader(
        tmp_path / "v", batch_size=2, num_workers=0, max_frames=32,
        mode="val", model_type="attention", seed=0, decode_backend=backend,
    )
    batches_cv2 = list(mk("cv2"))
    batches_nat = list(mk("native"))
    assert len(batches_cv2) == len(batches_nat) > 0
    for a, b in zip(batches_cv2, batches_nat):
        np.testing.assert_array_equal(a["video_id"], b["video_id"])
        np.testing.assert_array_equal(a["mask1"], b["mask1"])
        np.testing.assert_array_equal(a["mask2"], b["mask2"])
        for side in ("clip1", "clip2"):
            assert a[side].shape == b[side].shape
            diff = np.abs(
                a[side].astype(np.int16) - b[side].astype(np.int16)
            )
            assert diff.mean() < 3.0, diff.mean()


def test_train_mode_ignores_native_backend(tmp_path):
    """Augmented training always uses full-res cv2 frames regardless of the
    requested backend (native fuses the resize, which would skip the
    degradation/crop augmentations)."""
    from video_fingerprint_tpu.data.dataset import VideoFingerprintDataset
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path / "v", num_unique=1, num_frames=30, duplicates=0)
    ds = VideoFingerprintDataset(
        tmp_path / "v", mode="train", model_type="attention",
        decode_backend="native",
    )
    assert not ds._use_native


def test_scanner_native_decode_equivalence(video, tmp_path):
    """--native_decode scan results match the cv2 scan to high cosine."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.inference.scanner import FingerprintScanner
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint

    model = create_model("attention")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)))
    ckpt = tmp_path / "m.ckpt"
    save_checkpoint(ckpt, v["params"], v["batch_stats"],
                    {"model_type": "attention", "frame_size": 64, "max_frames": 64})
    d = video.parent
    a = FingerprintScanner(str(ckpt), device="cpu", batch_size=2,
                           buckets=(64,)).scan_directory(d, num_workers=1)
    b = FingerprintScanner(str(ckpt), device="cpu", batch_size=2, buckets=(64,),
                           native_decode=True).scan_directory(d, num_workers=1)
    assert set(a) == set(b)
    for k in a:
        cos = float(np.dot(a[k]["embedding"], b[k]["embedding"]))
        assert cos > 0.999, cos
