"""ctypes bindings for the native host-preprocessing runtime (native/vfp_host.cc).

The shared library is built on first use with g++ (no pip deps; pybind11 is
deliberately avoided — plain C ABI + ctypes). Falls back cleanly when a
toolchain is unavailable: callers check `available()` and use the cv2 path.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "vfp_host.cc"
_SO = _REPO_ROOT / "native" / "libvfp_host.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        needs_build = not _SO.exists() or (
            _SRC.exists() and _SO.stat().st_mtime < _SRC.stat().st_mtime
        )
        if needs_build:
            if not _SRC.exists() or not _build():
                # a prebuilt .so without the source is still usable
                if not _SO.exists():
                    return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.vfp_init.argtypes = [ctypes.c_int]
        lib.vfp_init.restype = ctypes.c_int
        lib.vfp_preprocess_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.vfp_fill_batch_row.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.vfp_init(0)
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def preprocess_frames(frames: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, 3) uint8 RGB -> (T, size, size, 3) float32 in [0, 1].

    Native fused short-side-resize + center-crop + normalize with the
    library's thread pool. Raises RuntimeError if the library is unavailable.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native vfp_host library unavailable")
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    out = np.empty((t, size, size, 3), np.float32)
    lib.vfp_preprocess_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size,
    )
    return out


def fill_batch_row(clip: np.ndarray, batch: np.ndarray, row: int) -> None:
    """Copy (t, s, s, 3) f32 clip into batch[row] and zero the padding tail."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native vfp_host library unavailable")
    t = clip.shape[0]
    bucket, size = batch.shape[1], batch.shape[2]
    lib.vfp_fill_batch_row(
        np.ascontiguousarray(clip).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        row, bucket, size,
    )
