"""ctypes bindings for the native NIfTI decoder (libglnative.so).

Falls back silently when the library can't be built/loaded; callers check
``native_available()`` or just use ``glfusion_tpu.data.nifti.read_nifti``,
which routes here automatically.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GLFUSION_NO_NATIVE"):
        return None
    from glfusion_tpu.native.build import SO_PATH, build

    if not SO_PATH.exists():
        if not build(verbose=False):
            return None
    try:
        lib = ctypes.CDLL(str(SO_PATH))
        # stale .so from an older source revision: rebuild once
        if not hasattr(lib, "gl_nifti_query_v2"):
            del lib
            if not build(verbose=False):
                return None
            lib = ctypes.CDLL(str(SO_PATH))
    except OSError:
        return None
    lib.gl_nifti_query_v2.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.gl_nifti_query_v2.restype = ctypes.c_int
    lib.gl_nifti_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.gl_nifti_read_f32.restype = ctypes.c_int
    lib.gl_nifti_read_many_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.gl_nifti_read_many_f32.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


# NIfTI datatype code → numpy dtype (must match the C++ decode table)
_NIFTI_DTYPES = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
                 64: np.float64, 256: np.int8, 512: np.uint16,
                 768: np.uint32}
# dtypes whose values round-trip exactly through the f32 decode core
# (f64 and 32-bit integers can exceed f32's 24-bit mantissa → python reader)
_F32_EXACT = {2: np.uint8, 4: np.int16, 16: np.float32, 256: np.int8,
              512: np.uint16}


def _query(lib, path: str):
    """(shape, numel, dtype_code, scl_slope, scl_inter) from the header."""
    dims = (ctypes.c_int64 * 8)()
    dtype = ctypes.c_int()
    numel = ctypes.c_int64()
    slope = ctypes.c_float()
    inter = ctypes.c_float()
    rc = lib.gl_nifti_query_v2(str(path).encode(), dims,
                               ctypes.byref(dtype), ctypes.byref(numel),
                               ctypes.byref(slope), ctypes.byref(inter))
    if rc != 0:
        raise IOError(f"native nifti query failed ({rc}): {path}")
    ndim = int(dims[0])
    shape = tuple(int(dims[1 + i]) for i in range(ndim))
    return shape, int(numel.value), int(dtype.value), slope.value, inter.value


def _scaled(slope: float, inter: float) -> bool:
    """Whether the C++ core applies scl_slope/scl_inter (same predicate as
    ``convert`` in nifti_reader.cpp): values are then floats, not the
    on-disk integers."""
    return slope not in (0.0, 1.0) or inter != 0.0


def _out_dtype(dtype_code: int, slope: float, inter: float):
    """On-disk dtype if the f32 decode is exact and unscaled, float32 if
    scaling was applied, None if the file must go to the Python reader."""
    if _scaled(slope, inter):
        # the decode core applied slope/inter → values are floats; casting
        # back to the integer on-disk dtype would truncate them
        return np.float32 if dtype_code in _F32_EXACT else None
    return _F32_EXACT.get(dtype_code)


def read_nifti_native(path: str | Path) -> np.ndarray:
    """Single-volume read, matching ``read_nifti_py``'s dtype semantics:
    unscaled volumes keep their on-disk dtype; scl_slope/scl_inter-scaled
    volumes come back as float32 (the Python reader returns scaled floats).
    float64 and 32-bit-integer volumes can't round-trip exactly through the
    f32 decode core → routed to the Python reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shape, numel, dtype_code, slope, inter = _query(lib, path)
    np_dtype = _out_dtype(dtype_code, slope, inter)
    if np_dtype is None:
        raise IOError(f"dtype {dtype_code} routed to python reader")
    out = np.empty(numel, np.float32)
    rc = lib.gl_nifti_read_f32(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        numel)
    if rc != 0:
        raise IOError(f"native nifti read failed ({rc}): {path}")
    arr = out.reshape(shape, order="F")
    return arr if np_dtype == np.float32 else arr.astype(np_dtype)


def read_nifti_batch_native(paths: Sequence[str | Path],
                            num_threads: int = 0) -> list[np.ndarray]:
    """Parallel batch read (C++ thread pool).

    Each volume comes back with the same dtype ``read_nifti_native`` would
    give it (on-disk dtype when exact, float32 when header-scaled); raises
    if any file needs the Python reader so callers fall back per-file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shapes, numels, offsets, dtypes = [], [], [], []
    total = 0
    for p in paths:
        shape, numel, dtype_code, slope, inter = _query(lib, p)
        np_dtype = _out_dtype(dtype_code, slope, inter)
        if np_dtype is None:
            raise IOError(f"dtype {dtype_code} routed to python reader: {p}")
        shapes.append(shape)
        numels.append(numel)
        offsets.append(total)
        dtypes.append(np_dtype)
        total += numel
    flat = np.empty(total, np.float32)
    c_paths = (ctypes.c_char_p * len(paths))(
        *[str(p).encode() for p in paths])
    c_off = (ctypes.c_int64 * len(paths))(*offsets)
    c_num = (ctypes.c_int64 * len(paths))(*numels)
    failed = lib.gl_nifti_read_many_f32(
        c_paths, len(paths),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c_off, c_num, num_threads)
    if failed:
        raise IOError(f"native batch read: {failed}/{len(paths)} failed")
    return [flat[o:o + n].reshape(s, order="F") if d == np.float32
            else flat[o:o + n].reshape(s, order="F").astype(d)
            for o, n, s, d in zip(offsets, numels, shapes, dtypes)]
