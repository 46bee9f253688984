"""Native (C++) host runtime: build-on-first-use ctypes bindings.

Compiles `fccqp_io.cpp` with the system toolchain into a cached shared
library and binds it with ctypes (no pybind11 dependency). Import
`fcc_qp_tpu.native.io_native`; if no toolchain is available the import
raises and callers fall back to the pure-numpy implementations in
`fcc_qp_tpu.utils.io`.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fccqp_io.cpp")


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "FCC_QP_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "fcc_qp_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"fccqp_io_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    tmp = so_path + f".tmp{os.getpid()}"
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        _SRC,
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so_path)
    return so_path


def load_library() -> ctypes.CDLL:
    lib = ctypes.CDLL(_build())
    lib.fqlog_read_header.restype = ctypes.c_int
    lib.fqlog_read_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.fqlog_read_into.restype = ctypes.c_int
    lib.fqlog_read_into.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.fqlog_write.restype = ctypes.c_int
    lib.fqlog_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.ds_split.restype = None
    lib.ds_split.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.ds_split_batch_last.restype = None
    lib.ds_split_batch_last.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    return lib
