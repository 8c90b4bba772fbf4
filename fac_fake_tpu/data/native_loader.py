"""ctypes wrapper for the native C++ batch JPEG decoder.

Builds `fac_fake_tpu/native/decoder.cpp` on first use (g++ -O3 against
libjpeg; the image ships both) and caches the .so next to the source. Falls
back silently to the cv2 path when the toolchain or libjpeg is unavailable —
`CropFolderDataset` auto-selects.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "decoder.cpp")
_SO = os.path.join(_NATIVE_DIR, "libfacdecoder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-ljpeg", "-pthread"],
            check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(_SO)
    except Exception:
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            lib = _build()
            if lib is not None:
                lib.fac_decode_batch.restype = ctypes.c_int
                lib.fac_decode_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_batch(paths: List[str], size: int,
                 threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs into (n, size, size, 3) uint8 RGB + ok mask (n,)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fac_decode_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok.astype(bool)
