"""Video decode layer (L0) — the framework's single decode implementation.

The reference duplicates decode logic between train-time (dataset.py:109-195)
and scan-time (fingerprint.py:74-184); here one module serves both. Decoding
is host-side by necessity (codecs), behind a small backend registry:

  - "opencv": cv2.VideoCapture (ffmpeg inside the wheel) — default.
  - "pyav":   PyAV, used automatically when importable (matches the
              reference's decoder); optional in this image.

All functions return RGB24 uint8 frames. Decode failures degrade exactly like
the reference: black 480x640 frames for training (dataset.py:151-153), None /
empty for scanning (fingerprint.py:105-107).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional

import numpy as np

try:  # optional backend, matches the reference's decoder when present
    import av  # type: ignore

    _HAS_AV = True
except Exception:  # pragma: no cover
    av = None
    _HAS_AV = False

import cv2


@dataclasses.dataclass(frozen=True)
class VideoInfo:
    total_frames: int
    fps: float
    duration: float
    width: int = 0
    height: int = 0


DEFAULT_BACKEND = "pyav" if _HAS_AV else "opencv"


def probe(path: Path | str, backend: str = DEFAULT_BACKEND) -> Optional[VideoInfo]:
    """Video metadata; reference `_get_video_info` (fingerprint.py:111-129)."""
    try:
        if backend == "pyav" and _HAS_AV:
            container = av.open(str(path))
            stream = container.streams.video[0]
            total = stream.frames
            if total == 0 and stream.duration:
                total = int(stream.duration * stream.average_rate)
            fps = float(stream.average_rate or 0)
            w, h = stream.codec_context.width, stream.codec_context.height
            container.close()
        else:
            cap = cv2.VideoCapture(str(path))
            if not cap.isOpened():
                return None
            total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            fps = float(cap.get(cv2.CAP_PROP_FPS))
            w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            cap.release()
        duration = total / fps if fps > 0 else 0.0
        return VideoInfo(total_frames=total, fps=fps, duration=duration, width=w, height=h)
    except Exception:
        return None


def decode_subsampled(
    path: Path | str,
    max_frames: int,
    skip_rate: Optional[int] = None,
    backend: str = DEFAULT_BACKEND,
) -> List[np.ndarray]:
    """Decode every `skip_rate`-th frame up to `max_frames` frames.

    skip_rate=None derives max(1, total // max_frames) — the reference's
    subsampling policy (fingerprint.py:90-91, dataset.py:134). Frames the
    policy skips are *grabbed but not converted* (no colourspace conversion /
    copy), which is the cheap-decode pushdown the reference lacks.
    """
    try:
        if backend == "pyav" and _HAS_AV:
            return _decode_subsampled_av(path, max_frames, skip_rate)
        return _decode_subsampled_cv2(path, max_frames, skip_rate)
    except Exception:
        return []


def _derive_skip(total: int, max_frames: int, skip_rate: Optional[int]) -> int:
    """An explicit skip_rate wins outright: the train-time speed jitter
    (reference dataset.py:128-134) intentionally passes skips BELOW the
    derived total//max_frames for speed < 1.0 — the decode then samples the
    first part of the video densely and the max_frames cap truncates, which
    is the reference's slow-motion augmentation. Clamping up to the derived
    value would silently erase the [0.5, 1.0) half of the jitter range."""
    if skip_rate:
        return max(1, skip_rate)
    return max(1, total // max_frames) if total > max_frames else 1


def _decode_subsampled_cv2(path, max_frames, skip_rate) -> List[np.ndarray]:
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        return []
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    skip = _derive_skip(total, max_frames, skip_rate)
    frames: List[np.ndarray] = []
    i = 0
    while len(frames) < max_frames:
        if i % skip == 0:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
        else:
            if not cap.grab():  # decode-skip: no conversion, no copy out
                break
        i += 1
    cap.release()
    return frames


def _decode_subsampled_av(path, max_frames, skip_rate) -> List[np.ndarray]:
    container = av.open(str(path))
    stream = container.streams.video[0]
    total = stream.frames
    if total == 0 and stream.duration:
        total = int(stream.duration * stream.average_rate)
    skip = _derive_skip(total, max_frames, skip_rate)
    frames: List[np.ndarray] = []
    for i, frame in enumerate(container.decode(stream)):
        if i % skip == 0:
            frames.append(frame.to_ndarray(format="rgb24"))
            if len(frames) >= max_frames:
                break
    container.close()
    return frames


def decode_clip(
    path: Path | str,
    start_frame: int,
    num_frames: int,
    backend: str = DEFAULT_BACKEND,
) -> List[np.ndarray]:
    """Decode a contiguous clip, padding by repeating the last frame
    (reference `_load_clip_frames`, dataset.py:160-195)."""
    frames: List[np.ndarray] = []
    try:
        if backend == "pyav" and _HAS_AV:
            # Correct pts-based seek. NB the reference passes a *frame index*
            # to container.seek (dataset.py:169, fingerprint.py:142), which
            # PyAV interprets in stream.time_base units — effectively always
            # seeking to ~0s. We seek to the true timestamp and discard
            # frames decoded before it (deliberate fix, documented).
            container = av.open(str(path))
            stream = container.streams.video[0]
            fps = float(stream.average_rate or 0)
            target_pts = 0
            if start_frame > 0 and fps > 0 and stream.time_base:
                seconds = start_frame / fps
                target_pts = int(seconds / stream.time_base)
                container.seek(target_pts, stream=stream)
            for frame in container.decode(stream):
                if frame.pts is not None and frame.pts < target_pts:
                    continue
                frames.append(frame.to_ndarray(format="rgb24"))
                if len(frames) >= num_frames:
                    break
            container.close()
        else:
            cap = cv2.VideoCapture(str(path))
            if cap.isOpened():
                if start_frame > 0:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
                while len(frames) < num_frames:
                    ok, bgr = cap.read()
                    if not ok:
                        break
                    frames.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            cap.release()
    except Exception:
        frames = []

    while len(frames) < num_frames:
        frames.append(
            frames[-1].copy()
            if frames
            else np.zeros((480, 640, 3), dtype=np.uint8)
        )
    return frames[:num_frames]


def black_fallback_frames(n: int = 30) -> List[np.ndarray]:
    """Reference decode-failure fallback (dataset.py:151-153)."""
    return [np.zeros((480, 640, 3), dtype=np.uint8) for _ in range(n)]
