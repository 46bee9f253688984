"""numpy-facing wrappers over the native IO library."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from fcc_qp_tpu.native import load_library

_LIB = load_library()

QP_KEYS = ("Q", "b", "A_eq", "b_eq", "friction_coeffs", "lb", "ub")


def _shapes(T: int, n: int, m: int, c: int) -> dict:
    return {
        "Q": (T, n, n),
        "b": (T, n),
        "A_eq": (T, m, n),
        "b_eq": (T, m),
        "friction_coeffs": (T, c),
        "lb": (T, n),
        "ub": (T, n),
    }


def load_packed(path: str) -> dict:
    """Native .fqlog reader (mmap copy into numpy arrays)."""
    dims = (ctypes.c_uint32 * 4)()
    rc = _LIB.fqlog_read_header(path.encode(), dims)
    if rc != 0:
        raise ValueError(f"{path}: not a valid fqlog file (rc={rc})")
    T, n, m, c = (int(d) for d in dims)
    out = {k: np.empty(s, np.float64) for k, s in _shapes(T, n, m, c).items()}
    ptrs = (ctypes.c_void_p * 7)(
        *[out[k].ctypes.data_as(ctypes.c_void_p).value for k in QP_KEYS]
    )
    rc = _LIB.fqlog_read_into(path.encode(), ptrs)
    if rc != 0:
        raise ValueError(f"{path}: fqlog read failed (rc={rc})")
    return out


def save_packed(path: str, stacked: dict) -> None:
    """Native .fqlog writer from a stacked dict (reference schema)."""
    arrs = [np.ascontiguousarray(stacked[k], np.float64) for k in QP_KEYS]
    T, n = arrs[1].shape
    m = arrs[3].shape[1]
    c = arrs[4].shape[1]
    ptrs = (ctypes.c_void_p * 7)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    rc = _LIB.fqlog_write(path.encode(), T, n, m, c, ptrs)
    if rc != 0:
        raise IOError(f"{path}: fqlog write failed (rc={rc})")


def ds_split(x: np.ndarray, n_threads: int | None = None):
    """One-pass f64 -> (hi, lo) double-single split (inf-safe)."""
    x = np.ascontiguousarray(x, np.float64)
    hi = np.empty(x.shape, np.float32)
    lo = np.empty(x.shape, np.float32)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    _LIB.ds_split(
        x.ctypes.data_as(ctypes.c_void_p),
        hi.ctypes.data_as(ctypes.c_void_p),
        lo.ctypes.data_as(ctypes.c_void_p),
        x.size,
        n_threads,
    )
    return hi, lo


def ds_split_batch_last(x: np.ndarray):
    """(T, rows, cols) f64 -> batch-last (rows, cols, T) hi/lo pair in a
    single fused transpose+split pass."""
    x = np.ascontiguousarray(x, np.float64)
    if x.ndim == 2:
        T, rows = x.shape
        cols = 1
        out_shape = (rows, T)
    elif x.ndim == 3:
        T, rows, cols = x.shape
        out_shape = (rows, cols, T)
    else:
        raise ValueError("expected (T, rows[, cols]) array")
    hi = np.empty(out_shape, np.float32)
    lo = np.empty(out_shape, np.float32)
    _LIB.ds_split_batch_last(
        x.ctypes.data_as(ctypes.c_void_p),
        hi.ctypes.data_as(ctypes.c_void_p),
        lo.ctypes.data_as(ctypes.c_void_p),
        T,
        rows,
        cols,
    )
    return hi, lo
