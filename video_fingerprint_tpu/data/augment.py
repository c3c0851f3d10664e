"""Augmentation pipeline (C14) + train-time resize (C13), host-side.

Same transforms, probabilities and parameter ranges as the reference
(dataset.py:197-244, :246-353), with one deliberate change: every draw comes
from an explicit np.random.Generator, so the pipeline is reproducible
(SURVEY.md §7: the reference uses unseeded global RNGs everywhere).

Clip-level parameters are sampled once and applied to every frame (temporal
consistency, like the reference); the resize/crop path samples per frame
(also like the reference — dataset.py:438 calls _resize_frame per frame).

JPEG recompression stays host-side (it's a codec); everything else is cheap
numpy/cv2 on uint8.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import cv2
import numpy as np

from video_fingerprint_tpu.data.preprocess import resize_short_side_center_crop

_RESOLUTIONS = [(480, 640), (720, 1280), (1080, 1920), (360, 640)]


def train_resize_frame(
    frame: np.ndarray,
    size: int,
    rng: np.random.Generator,
    apply_resolution_change: bool = True,
    augment: bool = True,
) -> np.ndarray:
    """Random resolution degradation (p=.5) + random crop ratio [.8,1] (p=.7)
    + aspect-preserving resize/center-crop (reference dataset.py:197-244)."""
    h, w = frame.shape[:2]

    if apply_resolution_change and augment and rng.random() > 0.5:
        target_h, target_w = _RESOLUTIONS[rng.integers(len(_RESOLUTIONS))]
        if h > target_h or w > target_w:
            scale = min(target_h / h, target_w / w)
            new_h, new_w = int(h * scale), int(w * scale)
            frame = cv2.resize(frame, (new_w, new_h), interpolation=cv2.INTER_AREA)
            h, w = new_h, new_w

    if augment and rng.random() > 0.3:
        crop_ratio = rng.uniform(0.8, 1.0)
        crop_h, crop_w = int(h * crop_ratio), int(w * crop_ratio)
        start_h = rng.integers(0, h - crop_h + 1)
        start_w = rng.integers(0, w - crop_w + 1)
        frame = frame[start_h : start_h + crop_h, start_w : start_w + crop_w]

    return resize_short_side_center_crop(frame, size)


@dataclasses.dataclass
class ClipAugmentParams:
    """One draw of clip-level augmentation parameters."""

    brightness: float = 1.0
    contrast: float = 1.0
    saturation: float = 1.0
    hue_shift: float = 0.0
    do_color: bool = False
    do_flip: bool = False
    noise_level: float = 0.0
    jpeg_quality: int = 100
    do_compression: bool = False
    blur_kernel: int = 0
    do_letterbox: bool = False
    letterbox_bar: int = 0
    letterbox_vertical: bool = False
    do_overlay: bool = False
    overlay_box: tuple = (0, 0, 0, 0)  # y, x, h, w
    do_rotation: bool = False
    rotation_angle: float = 0.0

    @staticmethod
    def sample(rng: np.random.Generator, frame_size: int) -> "ClipAugmentParams":
        p = ClipAugmentParams()
        p.do_color = rng.random() > 0.3
        p.do_flip = rng.random() > 0.5
        do_noise = rng.random() > 0.7
        p.do_compression = rng.random() > 0.5
        do_blur = rng.random() > 0.5
        p.do_letterbox = rng.random() > 0.7
        p.do_overlay = rng.random() > 0.8
        p.do_rotation = rng.random() > 0.8

        if p.do_color:
            p.brightness = rng.uniform(0.5, 1.5)
            p.contrast = rng.uniform(0.5, 1.5)
            p.saturation = rng.uniform(0.5, 1.5)
            p.hue_shift = rng.uniform(-0.1, 0.1)
        p.noise_level = rng.uniform(0.02, 0.1) if do_noise else 0.0
        p.jpeg_quality = int(rng.integers(30, 91)) if p.do_compression else 100
        p.blur_kernel = int([3, 5, 7][rng.integers(3)]) if do_blur else 0
        if p.do_letterbox:
            p.letterbox_bar = int(rng.integers(5, 16))
            p.letterbox_vertical = rng.random() > 0.5
        if p.do_overlay:
            oh = int(rng.integers(10, 21))
            ow = int(rng.integers(30, 61))
            oy = int(rng.integers(0, max(1, frame_size - oh)))
            ox = int(rng.integers(0, max(1, frame_size - ow)))
            p.overlay_box = (oy, ox, oh, ow)
        if p.do_rotation:
            p.rotation_angle = rng.uniform(-5, 5)
        return p


def apply_jpeg_only(
    frames: List[np.ndarray], rng: np.random.Generator
) -> List[np.ndarray]:
    """The host-side subset for device-augment mode (ops/device_augment.py):
    JPEG recompression is a codec and cannot move on-device; everything else
    runs inside the train step. Same p=.5 gate and quality range as the full
    pipeline (reference dataset.py:257, :313-319)."""
    p = ClipAugmentParams()
    p.do_compression = rng.random() > 0.5
    if p.do_compression:
        p.jpeg_quality = int(rng.integers(30, 91))
    return apply_augmentations(frames, rng, 0, params=p)


def apply_augmentations(
    frames: List[np.ndarray],
    rng: np.random.Generator,
    frame_size: int,
    params: Optional[ClipAugmentParams] = None,
) -> List[np.ndarray]:
    """Apply one set of clip-level params to all frames (dataset.py:246-353)."""
    p = params or ClipAugmentParams.sample(rng, frame_size)
    out = []
    for frame in frames:
        f = frame.copy()

        if p.do_color:
            x = f.astype(np.float32) / 255.0
            hsv = cv2.cvtColor((x * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
                np.float32
            )
            hsv[:, :, 0] = (hsv[:, :, 0] + p.hue_shift * 180) % 180
            x = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                np.float32
            ) / 255.0
            x = x * p.brightness
            x = (x - 0.5) * p.contrast + 0.5
            # clip before the uint8 cast: brightness/contrast push values
            # outside [0,1] and an unclipped cast wraps modulo 256, feeding
            # garbage into the saturation blend below
            gray = cv2.cvtColor(
                (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY
            )
            gray = cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB).astype(np.float32) / 255.0
            x = p.saturation * x + (1 - p.saturation) * gray
            f = np.clip(x * 255, 0, 255).astype(np.uint8)

        if p.do_flip:
            f = cv2.flip(f, 1)

        if p.noise_level > 0:
            noise = rng.standard_normal(f.shape) * p.noise_level * 255
            f = np.clip(f.astype(np.float32) + noise, 0, 255).astype(np.uint8)

        if p.blur_kernel:
            f = cv2.GaussianBlur(f, (p.blur_kernel, p.blur_kernel), 0)

        if p.do_compression:
            ok, enc = cv2.imencode(
                ".jpg",
                cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
                [int(cv2.IMWRITE_JPEG_QUALITY), p.jpeg_quality],
            )
            if ok:
                f = cv2.cvtColor(cv2.imdecode(enc, 1), cv2.COLOR_BGR2RGB)

        if p.do_letterbox:
            b = p.letterbox_bar
            if p.letterbox_vertical:
                f[:b, :] = 0
                f[-b:, :] = 0
            else:
                f[:, :b] = 0
                f[:, -b:] = 0

        if p.do_overlay:
            oy, ox, oh, ow = p.overlay_box
            region = f[oy : oy + oh, ox : ox + ow].astype(np.float32)
            f[oy : oy + oh, ox : ox + ow] = (
                0.7 * region + 0.3 * 255.0
            ).astype(np.uint8)

        if p.do_rotation:
            center = (f.shape[1] // 2, f.shape[0] // 2)
            M = cv2.getRotationMatrix2D(center, p.rotation_angle, 1.0)
            f = cv2.warpAffine(f, M, (f.shape[1], f.shape[0]))

        out.append(f)
    return out
