"""ctypes bindings for the native C++ image loader (native/uavloader.cc).

Auto-builds the shared library on first use (g++, ~2 s) and falls back to
the PIL/cv2 python path when the toolchain or libjpeg is unavailable.
"""

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libuavloader.so"))

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.uav_decode_resize_batch.restype = ctypes.c_int
    lib.uav_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    lib.uav_decode_resize.restype = ctypes.c_int
    lib.uav_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def decode_resize_batch(paths: List[str], size: int,
                        threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+normalize a batch of JPEGs natively.

    → (images (N, size, size, 3) float32 in [0,1], ok (N,) bool)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.uav_decode_resize_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok.astype(bool)
