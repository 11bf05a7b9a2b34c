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
    from glfusion_tpu.native.build import build, so_path

    # so_path() embeds a hash of the C++ source: a stale revision lives at
    # a different filename and can never be picked up (or dlopen-cached).
    path = so_path()
    if not path.exists():
        if not build(verbose=False):
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.gl_nifti_query_v2.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.gl_nifti_query_v2.restype = ctypes.c_int
    lib.gl_nifti_read_raw.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.gl_nifti_read_raw.restype = ctypes.c_int
    lib.gl_nifti_read_many_raw.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.gl_nifti_read_many_raw.restype = ctypes.c_int
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
    ``needs_scaling`` in nifti_reader.cpp / data/nifti.py): values are then
    floats, not the on-disk integers. slope==0 or non-finite = no scaling,
    per the NIfTI-1 spec."""
    from glfusion_tpu.data.nifti import needs_scaling
    return needs_scaling(slope, inter)


def read_nifti_native(path: str | Path) -> np.ndarray:
    """Single-volume read, matching ``read_nifti_py``'s dtype semantics:
    unscaled volumes keep their on-disk dtype (raw byte copy — exact for
    EVERY dtype, no f32 round trip); scl_slope/scl_inter-scaled volumes
    come back as float32 via the converting core. Scaled 32-bit-int/f64
    volumes and big-endian files route to the exact Python reader."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    shape, numel, dtype_code, slope, inter = _query(lib, path)
    np_dtype = _NIFTI_DTYPES.get(dtype_code)
    if np_dtype is None:
        raise IOError(f"dtype {dtype_code} routed to python reader")
    if not _scaled(slope, inter):
        itemsize = np.dtype(np_dtype).itemsize
        out = np.empty(numel * itemsize, np.uint8)
        rc = lib.gl_nifti_read_raw(
            str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            numel * itemsize)
        if rc != 0:  # 5 = big-endian → python reader byte-swaps
            raise IOError(f"native raw read failed ({rc}): {path}")
        return out.view(np_dtype).reshape(shape, order="F")
    if np_dtype not in _F32_EXACT.values():
        raise IOError(f"scaled dtype {dtype_code} routed to python reader")
    out = np.empty(numel, np.float32)
    rc = lib.gl_nifti_read_f32(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        numel)
    if rc != 0:
        raise IOError(f"native nifti read failed ({rc}): {path}")
    return out.reshape(shape, order="F")


def read_nifti_batch_native(paths: Sequence[str | Path],
                            num_threads: int = 0) -> list[np.ndarray]:
    """Parallel batch read (C++ thread pool).

    Each volume comes back with the same dtype ``read_nifti_native`` would
    give it (on-disk dtype when unscaled — raw byte copies, exact for every
    dtype; float32 when header-scaled); raises if any file needs the Python
    reader (scaled non-f32-exact dtypes, big-endian) so callers fall back
    per-file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    metas = [_query(lib, p) for p in paths]
    scaled = [_scaled(slope, inter) for _, _, _, slope, inter in metas]
    dtypes = []
    for (_, _, code, slope, inter), sc in zip(metas, scaled):
        np_dtype = _NIFTI_DTYPES.get(code)
        if np_dtype is None or (
                sc and np_dtype not in _F32_EXACT.values()):
            raise IOError(f"dtype {code} routed to python reader")
        dtypes.append(np.float32 if sc else np_dtype)
    c_paths = (ctypes.c_char_p * len(paths))(
        *[str(p).encode() for p in paths])

    if not any(scaled):
        # raw fast path: one flat byte buffer, zero conversions
        nbytes = [numel * np.dtype(d).itemsize
                  for (_, numel, *_), d in zip(metas, dtypes)]
        offsets = np.concatenate([[0], np.cumsum(nbytes[:-1])]).astype(
            np.int64) if nbytes else np.zeros(0, np.int64)
        flat = np.empty(int(sum(nbytes)), np.uint8)
        failed = lib.gl_nifti_read_many_raw(
            c_paths, len(paths),
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            (ctypes.c_int64 * len(paths))(*offsets.tolist()),
            (ctypes.c_int64 * len(paths))(*nbytes), num_threads)
        if failed:
            raise IOError(f"native batch read: {failed}/{len(paths)} failed")
        return [flat[o:o + n].view(d).reshape(m[0], order="F")
                for o, n, d, m in zip(offsets, nbytes, dtypes, metas)]

    # mixed scaled/unscaled batch goes through the f32 core: every entry
    # must then be f32-exact (raw exactness is unavailable here)
    if any(d not in (np.float32,) and d not in _F32_EXACT.values()
           for d in dtypes):
        raise IOError("mixed batch with f32-inexact dtype → python reader")
    numels = [m[1] for m in metas]
    offsets = [0]
    for n in numels[:-1]:
        offsets.append(offsets[-1] + n)
    flat = np.empty(sum(numels), np.float32)
    failed = lib.gl_nifti_read_many_f32(
        c_paths, len(paths),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        (ctypes.c_int64 * len(paths))(*offsets),
        (ctypes.c_int64 * len(paths))(*numels), num_threads)
    if failed:
        raise IOError(f"native batch read: {failed}/{len(paths)} failed")
    return [flat[o:o + n].reshape(m[0], order="F") if d == np.float32
            else flat[o:o + n].reshape(m[0], order="F").astype(d)
            for o, n, d, m in zip(offsets, numels, dtypes, metas)]
