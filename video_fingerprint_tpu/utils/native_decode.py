"""ctypes bindings for the native decode worker (native/vfp_decode.cc).

Fused demux -> decode -> scale -> crop; never materializes full-res RGB on
the Python side. Opt-in fast path (`available()` gates it); the cv2 path in
data/decode.py stays the bit-exactness default.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "vfp_decode.cc"
_SO = _REPO_ROOT / "native" / "libvfp_decode.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
             "-o", str(_SO), "-lavformat", "-lavcodec", "-lavutil", "-lswscale"],
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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.vfp_decode_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vfp_decode_probe.restype = ctypes.c_int
        lib.vfp_decode_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.vfp_decode_scan.restype = ctypes.c_int
        lib.vfp_decode_clip.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.vfp_decode_clip.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def probe(path) -> Optional[Tuple[int, float, int, int]]:
    """(total_frames, fps, width, height) or None."""
    lib = _load()
    if lib is None:
        return None
    frames = ctypes.c_longlong(0)
    fps = ctypes.c_double(0)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.vfp_decode_probe(str(path).encode(), ctypes.byref(frames),
                              ctypes.byref(fps), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return int(frames.value), float(fps.value), int(w.value), int(h.value)


def decode_scan(path, max_frames: int, size: int,
                skip_rate: Optional[int] = None) -> Optional[np.ndarray]:
    """Fused subsampled decode for the attention scan: (n, size, size, 3) u8
    (short-side scale + center crop per frame), or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_frames, size, size, 3), np.uint8)
    # skip_rate None -> 0: the worker derives max(1, total // max_frames)
    # inside its single open (no separate probe pass).
    n = lib.vfp_decode_scan(
        str(path).encode(), max_frames, int(skip_rate or 0), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n <= 0:
        return None
    return out[:n]


def decode_clip(path, start_frame: int, num_frames: int,
                size: int) -> Optional[np.ndarray]:
    """Fused contiguous-window decode for the 3D path: (num_frames, size,
    size, 3) u8, repeat-padding short reads; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.zeros((num_frames, size, size, 3), np.uint8)
    n = lib.vfp_decode_clip(
        str(path).encode(), int(start_frame), num_frames, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n <= 0:
        return None
    if n < num_frames:  # repeat last decoded frame (dataset.py:189-195)
        out[n:] = out[n - 1]
    return out
