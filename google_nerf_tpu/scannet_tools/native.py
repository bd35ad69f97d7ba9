"""ctypes bridge to the native (C++) .sens decode helpers, with automatic
on-demand build and pure-Python fallback."""
from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsens_decode.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.sens_zlib_decompress.restype = ctypes.c_int64
        lib.sens_zlib_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.sens_zlib_decompress_batch.restype = ctypes.c_int64
        lib.sens_zlib_decompress_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def zlib_decompress(data: bytes, max_size: int = 32 << 20) -> bytes:
    """Single-buffer decompress (native if available, else Python zlib)."""
    lib = _load()
    if lib is None:
        return zlib.decompress(data)
    out = (ctypes.c_uint8 * max_size)()
    n = lib.sens_zlib_decompress(data, len(data), out, max_size)
    if n < 0:
        return zlib.decompress(data)  # fall back on error
    return bytes(bytearray(out[:n]))


def zlib_decompress_batch(buffers: List[bytes], item_size: int,
                          n_threads: int = 0) -> np.ndarray:
    """Decompress many equal-size buffers in parallel -> (n, item_size)
    uint8 array.  Used to bulk-decode .sens depth streams."""
    n = len(buffers)
    out = np.empty((n, item_size), np.uint8)
    lib = _load()
    if lib is None:
        for i, b in enumerate(buffers):
            d = zlib.decompress(b)
            out[i] = np.frombuffer(d, np.uint8, item_size)
        return out
    srcs = (ctypes.c_char_p * n)(*buffers)
    lens = (ctypes.c_int64 * n)(*[len(b) for b in buffers])
    outlens = (ctypes.c_int64 * n)()
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    failed = lib.sens_zlib_decompress_batch(
        srcs, lens, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        item_size, outlens, n_threads)
    if failed:
        raise ValueError(f"{failed} buffers failed to decompress")
    return out
