"""ctypes bindings for the native data-path library (``native/libtbrnative.so``).

The reference's data layer is C++ (`TextureUtilities.cpp`: raw/zlib loads,
min/max scans, ParallelFor conversions); ours is too — threaded C++ behind a
C ABI, loaded with ctypes (pybind11 is not available in this image). Every
entry point has a numpy fallback so the framework works before/without the
native build; ``native_available()`` reports which path is active.

Build with ``make -C native`` (done automatically on first use when a
compiler is present).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("tbraymarcher.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtbrnative.so")

_DTYPE_CODES = {
    np.dtype("uint8"): 0,
    np.dtype("int8"): 1,
    np.dtype("uint16"): 2,
    np.dtype("int16"): 3,
    np.dtype("uint32"): 4,
    np.dtype("int32"): 5,
    np.dtype("float32"): 6,
}

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as exc:
        log.debug("native build failed: %s", exc)
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            if not os.path.isdir(_NATIVE_DIR) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            log.debug("native load failed: %s", exc)
            return None
        lib.tbr_minmax.restype = ctypes.c_int
        lib.tbr_minmax.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.tbr_normalize.restype = ctypes.c_int
        lib.tbr_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_void_p,
        ]
        lib.tbr_read_file.restype = ctypes.c_int64
        lib.tbr_read_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.tbr_zlib_decompress.restype = ctypes.c_int64
        lib.tbr_zlib_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.tbr_transpose_zyx_to_xyz_f32.restype = ctypes.c_int
        lib.tbr_transpose_zyx_to_xyz_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        _lib = lib
        log.info("native data-path library loaded from %s", _LIB_PATH)
        return _lib


def native_available() -> bool:
    return _load() is not None


def minmax(arr: np.ndarray) -> tuple[float, float]:
    """Threaded min/max scan (fallback: numpy)."""
    lib = _load()
    arr = np.ascontiguousarray(arr)
    code = _DTYPE_CODES.get(arr.dtype)
    if lib is None or code is None:
        return (float(arr.min()), float(arr.max())) if arr.size else (0.0, 0.0)
    lo = ctypes.c_double()
    hi = ctypes.c_double()
    rc = lib.tbr_minmax(
        arr.ctypes.data_as(ctypes.c_void_p), code, arr.size,
        ctypes.byref(lo), ctypes.byref(hi),
    )
    if rc != 0:
        return float(arr.min()), float(arr.max())
    return lo.value, hi.value


def normalize_to_f32(arr: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Threaded (x - lo) / (hi - lo) conversion to float32 (fallback: numpy)."""
    lib = _load()
    arr = np.ascontiguousarray(arr)
    code = _DTYPE_CODES.get(arr.dtype)
    if lib is None or code is None:
        scale = (hi - lo) or 1.0
        return ((arr.astype(np.float32) - lo) / scale).astype(np.float32)
    out = np.empty(arr.shape, np.float32)
    rc = lib.tbr_normalize(
        arr.ctypes.data_as(ctypes.c_void_p), code, arr.size,
        float(lo), float(hi), out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        scale = (hi - lo) or 1.0
        return ((arr.astype(np.float32) - lo) / scale).astype(np.float32)
    return out


def read_file(path: str, nbytes: int, offset: int = 0) -> bytes:
    """Native file read (fallback: python open/read)."""
    lib = _load()
    if lib is None:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(nbytes)
    buf = np.empty(nbytes, np.uint8)
    got = lib.tbr_read_file(
        path.encode(), offset, nbytes, buf.ctypes.data_as(ctypes.c_void_p)
    )
    if got < 0:
        raise OSError(f"native read failed for {path} (rc={got})")
    return buf[:got].tobytes()


def zlib_decompress(blob: bytes, expected_bytes: int) -> bytes:
    """Native zlib inflate (fallback: python zlib)."""
    lib = _load()
    if lib is None:
        import zlib

        return zlib.decompress(blob)
    src = np.frombuffer(blob, np.uint8)
    dst = np.empty(expected_bytes, np.uint8)
    got = lib.tbr_zlib_decompress(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        dst.ctypes.data_as(ctypes.c_void_p), expected_bytes,
    )
    if got < 0:
        raise ValueError(f"zlib inflate failed (rc={got})")
    return dst[:got].tobytes()


def transpose_zyx_to_xyz(arr_zyx: np.ndarray) -> np.ndarray:
    """Blocked threaded (z,y,x)->(x,y,z) f32 transpose (fallback: numpy)."""
    lib = _load()
    z, y, x = arr_zyx.shape
    if lib is None or arr_zyx.dtype != np.float32:
        return np.ascontiguousarray(arr_zyx.transpose(2, 1, 0))
    src = np.ascontiguousarray(arr_zyx)
    out = np.empty((x, y, z), np.float32)
    lib.tbr_transpose_zyx_to_xyz_f32(
        src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        x, y, z,
    )
    return out
