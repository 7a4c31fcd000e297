"""ctypes bridge to the C++ libsvm parser (csrc/libsvm_parser.cpp).

The reference's parser (dmlc-core ``libsvm_parser.h``) is native C++ with
multithreaded chunk parsing; this module is its counterpart. Build with
``python -m difacto_tpu.data.build_ext``; everything degrades gracefully
to the NumPy engine when the shared library is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_libsvm_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.dft_parse_libsvm.restype = ctypes.c_int
    lib.dft_parse_libsvm.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,          # data, len
        ctypes.POINTER(ctypes.c_int64),           # out: num_rows
        ctypes.POINTER(ctypes.c_int64),           # out: nnz
        ctypes.POINTER(ctypes.c_void_p),          # out: labels (f32)
        ctypes.POINTER(ctypes.c_void_p),          # out: indptr (i64)
        ctypes.POINTER(ctypes.c_void_p),          # out: indices (u64)
        ctypes.POINTER(ctypes.c_void_p),          # out: values (f32)
        ctypes.c_int,                             # nthreads
    ]
    lib.dft_free.restype = None
    lib.dft_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "dft_localize"):  # older .so builds lack it
        lib.dft_localize.restype = ctypes.c_int
        lib.dft_localize.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64,                         # n
            ctypes.c_int32,                         # num_rows
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),   # inv
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),   # uids
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),   # counts
            ctypes.POINTER(ctypes.c_int64),         # out: n_unique
        ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def localize_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "dft_localize")


def localize(keys: np.ndarray, num_rows: int):
    """Native radix dedup + inverse (csrc/localizer.cpp — the reference
    Localizer's C++ counterpart). ``keys`` i32 [n], negatives = padding.
    Returns (uids [nu] i32 sorted asc incl. trailing sentinel when pads
    exist, inv [n] i32, counts [nu] i64) — the _localize_ids contract."""
    lib = _load()
    n = keys.shape[0]
    inv = np.empty(n, np.int32)
    uids = np.empty(n, np.int32)
    counts = np.empty(n, np.int64)
    nu = ctypes.c_int64()
    rc = lib.dft_localize(
        np.ascontiguousarray(keys, np.int32), n, num_rows,
        inv, uids, counts, ctypes.byref(nu),
    )
    if rc != 0:
        raise RuntimeError(f"dft_localize failed (code {rc})")
    u = nu.value
    return uids[:u], inv, counts[:u]


def parse_libsvm(data: bytes, nthreads: int = 0):
    from .libsvm import RowBlock

    lib = _load()
    assert lib is not None
    nrows = ctypes.c_int64()
    nnz = ctypes.c_int64()
    p_lab = ctypes.c_void_p()
    p_ptr = ctypes.c_void_p()
    p_idx = ctypes.c_void_p()
    p_val = ctypes.c_void_p()
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 8)
    rc = lib.dft_parse_libsvm(
        data, len(data),
        ctypes.byref(nrows), ctypes.byref(nnz),
        ctypes.byref(p_lab), ctypes.byref(p_ptr),
        ctypes.byref(p_idx), ctypes.byref(p_val),
        nthreads,
    )
    if rc != 0:
        raise ValueError(f"libsvm parse failed (code {rc})")
    try:
        n, m = nrows.value, nnz.value
        labels = np.ctypeslib.as_array(
            ctypes.cast(p_lab, ctypes.POINTER(ctypes.c_float)), (n,)
        ).copy()
        indptr = np.ctypeslib.as_array(
            ctypes.cast(p_ptr, ctypes.POINTER(ctypes.c_int64)), (n + 1,)
        ).copy()
        indices = np.ctypeslib.as_array(
            ctypes.cast(p_idx, ctypes.POINTER(ctypes.c_uint64)), (m,)
        ).copy()
        values = np.ctypeslib.as_array(
            ctypes.cast(p_val, ctypes.POINTER(ctypes.c_float)), (m,)
        ).copy()
    finally:
        for p in (p_lab, p_ptr, p_idx, p_val):
            lib.dft_free(p)
    return RowBlock(labels, indptr, indices, values)
