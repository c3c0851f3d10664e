"""Frame preprocessing (L1): resize / crop / normalize.

One implementation serves train and scan paths (the reference duplicates it:
dataset.py:197-244 vs fingerprint.py:186-214 vs fingerprint.py:152-166). The
center-crop paths are kept bit-exact with the reference (same cv2 calls and
integer arithmetic) because eval parity depends on them.
"""

from __future__ import annotations

from typing import List, Sequence

import cv2
import numpy as np


def resize_short_side_center_crop(frame: np.ndarray, size: int) -> np.ndarray:
    """Aspect-preserving short-side resize to `size`, then center crop.

    Bit-exact with the reference eval/scan resize (dataset.py:227-244,
    fingerprint.py:190-208): INTER_AREA, floor division for the crop origin.
    """
    h, w = frame.shape[:2]
    if h < w:
        new_h, new_w = size, int(w * size / h)
    else:
        new_w, new_h = size, int(h * size / w)
    frame = cv2.resize(frame, (new_w, new_h), interpolation=cv2.INTER_AREA)
    h, w = frame.shape[:2]
    sh, sw = (h - size) // 2, (w - size) // 2
    return frame[sh : sh + size, sw : sw + size]


def square_center_crop_resize(frame: np.ndarray, size: int) -> np.ndarray:
    """Center-crop to square then INTER_LINEAR resize — the fast 3D-scan
    variant (fingerprint.py:152-166)."""
    h, w = frame.shape[:2]
    if h == size and w == size:
        return frame
    if h > w:
        start = (h - w) // 2
        frame = frame[start : start + w, :, :]
    elif w > h:
        start = (w - h) // 2
        frame = frame[:, start : start + h, :]
    return cv2.resize(frame, (size, size), interpolation=cv2.INTER_LINEAR)


def frames_to_clip(frames: Sequence[np.ndarray]) -> np.ndarray:
    """uint8 RGB frame list -> (T, H, W, C) float32 in [0, 1] (TPU layout)."""
    clip = np.stack(frames).astype(np.float32)
    clip /= 255.0
    return clip


def frames_to_clip_u8(frames: Sequence[np.ndarray]) -> np.ndarray:
    """uint8 RGB frame list -> (T, H, W, C) uint8. Normalization happens on
    device (x/255 fused into the first conv), so host->device transfers move
    4x fewer bytes — the H2D path is the scan bottleneck on tunneled TPUs."""
    return np.stack(frames)


def preprocess_frames(
    frames: Sequence[np.ndarray], size: int, normalize: bool = True
) -> np.ndarray:
    """Scan-time preprocess: resize+crop each frame, NHWC stack, optional
    host-side normalize (reference `_preprocess_frames`, fingerprint.py:
    186-214, minus the torch permute — we stay channels-last)."""
    resized = [resize_short_side_center_crop(f, size) for f in frames]
    return frames_to_clip(resized) if normalize else frames_to_clip_u8(resized)




def bucket_for_length(t: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= t (last bucket if t exceeds all)."""
    for b in buckets:
        if t <= b:
            return b
    return buckets[-1]


def default_buckets(max_frames: int) -> List[int]:
    """Length-bucket ladder for XLA static shapes (SURVEY.md §7 step 4).

    Geometric-ish ladder bounded by max_frames; one compiled program per
    bucket, padding waste <= ~30%.
    """
    ladder = [16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512]
    out = [b for b in ladder if b < max_frames]
    out.append(max_frames)
    return out
