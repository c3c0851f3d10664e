"""Native host-preprocess library vs the cv2 reference path."""

import numpy as np
import pytest

from video_fingerprint_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_preprocess_matches_cv2_closely():
    """The native area/bilinear resamplers track cv2 within quantization:
    mean abs diff < 1/255 and no structural offset."""
    from video_fingerprint_tpu.data.preprocess import preprocess_frames

    rng = np.random.default_rng(0)
    frames_u8 = (rng.random((4, 96, 150, 3)) * 255).astype(np.uint8)

    ours = native.preprocess_frames(frames_u8, 64)
    ref = preprocess_frames(list(frames_u8), 64)
    assert ours.shape == ref.shape == (4, 64, 64, 3)
    diff = np.abs(ours - ref)
    assert diff.mean() < 1.5 / 255, diff.mean()
    assert np.quantile(diff, 0.99) < 6.0 / 255


def test_preprocess_upscale_path():
    rng = np.random.default_rng(1)
    frames_u8 = (rng.random((2, 40, 50, 3)) * 255).astype(np.uint8)
    out = native.preprocess_frames(frames_u8, 64)
    assert out.shape == (2, 64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_fill_batch_row():
    rng = np.random.default_rng(2)
    clip = rng.random((5, 8, 8, 3)).astype(np.float32)
    batch = np.full((2, 9, 8, 8, 3), -1.0, np.float32)
    native.fill_batch_row(clip, batch, row=1)
    np.testing.assert_array_equal(batch[1, :5], clip)
    np.testing.assert_array_equal(batch[1, 5:], 0.0)
    np.testing.assert_array_equal(batch[0], -1.0)  # other rows untouched
