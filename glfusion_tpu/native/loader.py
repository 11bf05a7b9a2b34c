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
    except OSError:
        return None
    lib.gl_nifti_query.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64)]
    lib.gl_nifti_query.restype = ctypes.c_int
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


def _query(lib, path: str):
    dims = (ctypes.c_int64 * 8)()
    dtype = ctypes.c_int()
    numel = ctypes.c_int64()
    rc = lib.gl_nifti_query(str(path).encode(), dims,
                            ctypes.byref(dtype), ctypes.byref(numel))
    if rc != 0:
        raise IOError(f"native nifti query failed ({rc}): {path}")
    ndim = int(dims[0])
    shape = tuple(int(dims[1 + i]) for i in range(ndim))
    return shape, int(numel.value), int(dtype.value)


def read_nifti_native(path: str | Path) -> np.ndarray:
    """Single-volume read; preserves the on-disk dtype like the Python
    reader (the C++ core decodes to f32; integers round-trip exactly).
    float64 volumes would lose precision → handled by the Python reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shape, numel, dtype_code = _query(lib, path)
    np_dtype = _NIFTI_DTYPES.get(dtype_code)
    if np_dtype is None or np_dtype == np.float64:
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
    """Parallel batch read (C++ thread pool); float32 volumes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shapes, numels, offsets = [], [], []
    total = 0
    for p in paths:
        shape, numel, _ = _query(lib, p)
        shapes.append(shape)
        numels.append(numel)
        offsets.append(total)
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
    return [flat[o:o + n].reshape(s, order="F")
            for o, n, s in zip(offsets, numels, shapes)]
