"""ctypes bindings for the native framepack runtime (native/framepack.cpp).

Auto-builds the shared library with the system toolchain on first use
(make in native/); every entry point falls back to numpy when the
toolchain or library is unavailable, so the Python-only path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libframepack.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.pack_frames.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.pack_frames_swap.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def pack_frames(
    frames: Sequence[np.ndarray],
    swap: Optional[Sequence[bool]] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Stack equal-shaped HxWx3 uint8 frames into one contiguous
    (N, H, W, 3) buffer, optionally channel-reversing selected frames in
    the same pass. Native when available; numpy fallback otherwise."""
    n = len(frames)
    shape = frames[0].shape
    if out is None:
        out = np.empty((n,) + shape, np.uint8)

    lib = _load()
    contiguous = all(f.flags["C_CONTIGUOUS"] and f.dtype == np.uint8 for f in frames)
    if lib is None or not contiguous:
        for i, f in enumerate(frames):
            out[i] = f[..., ::-1] if (swap is not None and swap[i]) else f
        return out

    ptrs = (ctypes.c_void_p * n)(
        *[f.ctypes.data_as(ctypes.c_void_p).value for f in frames]
    )
    if swap is None or not any(swap):
        lib.pack_frames(
            ptrs,
            ctypes.c_int64(n),
            ctypes.c_int64(frames[0].nbytes),
            out.ctypes.data_as(ctypes.c_void_p),
        )
    else:
        flags = bytes(bytearray(1 if s else 0 for s in swap))
        pixels = shape[0] * shape[1]
        lib.pack_frames_swap(
            ptrs,
            flags,
            ctypes.c_int64(n),
            ctypes.c_int64(pixels),
            out.ctypes.data_as(ctypes.c_void_p),
        )
    return out
