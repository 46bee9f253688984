"""QP log IO: reference-compatible npz logs + packed binary fast path.

The reference loads its benchmark input with
``np.load('test_data/id_qp_log_{name}.npz', allow_pickle=True)['qps']``
(`/root/reference/fcc_qp_test.py:22-24`) — an object array of dicts with
keys ``Q, b, A_eq, b_eq, friction_coeffs, lb, ub``. That file is a
missing large blob in the mount, so this module can both (a) write/read
that exact schema for drop-in compatibility, and (b) use a packed
contiguous binary format (".fqlog") with a native C++ reader/writer
(see `fcc_qp_tpu/native`) for high-throughput host -> device feeding.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


QP_KEYS = ("Q", "b", "A_eq", "b_eq", "friction_coeffs", "lb", "ub")


def save_qp_log_npz(path: str, qps: Sequence[dict]) -> None:
    """Write the reference npz schema (object array of dicts)."""
    arr = np.empty(len(qps), dtype=object)
    for i, qp in enumerate(qps):
        arr[i] = {k: np.asarray(qp[k], dtype=np.float64) for k in QP_KEYS}
    np.savez(path, qps=arr)


def load_qp_log_npz(path: str):
    """Read the reference npz schema (mirror of `fcc_qp_test.py:22-24`)."""
    data = np.load(path, allow_pickle=True)
    return list(data["qps"])


def stack_qp_dicts(qps: Sequence[dict]) -> dict:
    """Stack a list of schema dicts into one dict of (T, ...) arrays —
    the contiguous host-side layout fed to the device."""
    return {
        k: np.stack([np.asarray(qp[k], dtype=np.float64) for qp in qps])
        for k in QP_KEYS
    }


def to_qpbatch(stacked: dict, dtype=None):
    """Convert stacked host arrays into a device `QPBatch`."""
    import jax.numpy as jnp

    from fcc_qp_tpu.types import QPBatch

    def conv(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if dtype is not None else a

    return QPBatch(**{k: conv(stacked[k]) for k in QP_KEYS})


# ---------------------------------------------------------------------------
# Packed binary format (.fqlog): a tiny header + contiguous f64 blocks.
# Layout: magic 'FQLG', version u32, T u32, n u32, m u32, n_cones u32,
# then T*(n*n + n + m*n + m + n_cones + n + n) f64 values in field order.
# The native C++ implementation (fcc_qp_tpu/native/fccqp_io.cpp) reads and
# writes the same format via mmap; this numpy version is the portable
# fallback and the format's executable spec.
# ---------------------------------------------------------------------------

_MAGIC = b"FQLG"
_VERSION = 1


def save_qp_log_packed(path: str, qps: Sequence[dict]) -> None:
    s = stack_qp_dicts(qps)
    T, n = s["b"].shape
    m = s["b_eq"].shape[1]
    n_cones = s["friction_coeffs"].shape[1]
    header = np.array([T, n, m, n_cones], dtype=np.uint32)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.array([_VERSION], dtype=np.uint32).tobytes())
        f.write(header.tobytes())
        for k in QP_KEYS:
            f.write(np.ascontiguousarray(s[k], dtype=np.float64).tobytes())


def load_qp_log_packed(path: str) -> dict:
    native = _native_io()
    if native is not None:
        return native.load_packed(path)
    return _load_qp_log_packed_numpy(path)


def _load_qp_log_packed_numpy(path: str) -> dict:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an fqlog file")
        version = np.frombuffer(f.read(4), dtype=np.uint32)[0]
        if version != _VERSION:
            raise ValueError(f"{path}: unsupported fqlog version {version}")
        T, n, m, n_cones = np.frombuffer(f.read(16), dtype=np.uint32)
        T, n, m, n_cones = int(T), int(n), int(m), int(n_cones)
        shapes = {
            "Q": (T, n, n),
            "b": (T, n),
            "A_eq": (T, m, n),
            "b_eq": (T, m),
            "friction_coeffs": (T, n_cones),
            "lb": (T, n),
            "ub": (T, n),
        }
        out = {}
        for k in QP_KEYS:
            cnt = int(np.prod(shapes[k]))
            out[k] = np.frombuffer(f.read(cnt * 8), dtype=np.float64).reshape(
                shapes[k]
            )
        return out


_NATIVE = None
_NATIVE_TRIED = False


def _native_io():
    """Load the native C++ IO library if built; else None."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from fcc_qp_tpu.native import io_native

            _NATIVE = io_native
        except Exception:
            _NATIVE = None
    return _NATIVE


def default_log_path(name: str = "walking", root: str | None = None) -> str:
    root = root or os.path.join(os.path.dirname(__file__), "..", "..", "test_data")
    return os.path.abspath(os.path.join(root, f"id_qp_log_{name}.npz"))


# ---------------------------------------------------------------------------
# warm-start checkpointing (SURVEY.md §5.4): the reference's only
# "resume" state is the in-memory warm start (x_, mu_x_, mu_lambda_c_
# persisting across Solve calls, /root/reference/src/fcc_qp.hpp:149-153).
# For long batched runs we persist that pytree to disk so a sequential
# replay or a large sweep can resume mid-stream.
# ---------------------------------------------------------------------------


def save_warm_start(path: str, warm) -> None:
    """Persist a `WarmStart` (f64) or `WarmStartDS` (f32-pair) pytree.

    Stores each leaf under its field path; the ds flavor keeps hi/lo
    words exactly (bit-exact resume).
    """
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(warm)[0]
    payload = {
        "__kind__": np.asarray(type(warm).__name__),
    }
    for keypath, leaf in leaves:
        key = "/".join(
            getattr(k, "name", None) or str(getattr(k, "idx", k))
            for k in keypath
        )
        payload[key] = np.asarray(leaf)
    np.savez(path, **payload)


def load_warm_start(path: str):
    """Load a warm-start pytree written by `save_warm_start`."""
    import jax.numpy as jnp

    from fcc_qp_tpu.types import WarmStart

    with np.load(path) as f:
        kind = str(f["__kind__"])
        data = {k: f[k] for k in f.files if k != "__kind__"}

    if kind == "WarmStartDS":
        from fcc_qp_tpu.core.ds_engine import WarmStartDS
        from fcc_qp_tpu.ops.ds import DS

        def d(name):
            return DS(
                jnp.asarray(data[f"{name}/hi"]),
                jnp.asarray(data[f"{name}/lo"]),
            )

        return WarmStartDS(
            x=d("x"), mu_x=d("mu_x"), mu_lambda_c=d("mu_lambda_c"),
            rho=jnp.asarray(data["rho"]),
        )
    if kind == "WarmStart":
        return WarmStart(
            **{k: jnp.asarray(v) for k, v in data.items()}
        )
    raise ValueError(f"{path}: unknown warm-start kind {kind!r}")
