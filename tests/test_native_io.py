"""Native C++ IO vs the numpy reference implementations."""

import numpy as np
import pytest

from fcc_qp_tpu.models.osc import QUADRUPED, generate_osc_sequence
from fcc_qp_tpu.utils.io import (
    _load_qp_log_packed_numpy,
    save_qp_log_packed,
    stack_qp_dicts,
)

io_native = pytest.importorskip(
    "fcc_qp_tpu.native.io_native", reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def log(tmp_path_factory):
    qps = generate_osc_sequence(QUADRUPED, 5, seed=0)
    path = str(tmp_path_factory.mktemp("fqlog") / "log.fqlog")
    save_qp_log_packed(path, qps)
    return path, stack_qp_dicts(qps)


class TestNativeFqlog:
    def test_read_matches_numpy(self, log):
        path, stacked = log
        native = io_native.load_packed(path)
        ref = _load_qp_log_packed_numpy(path)
        for k in stacked:
            np.testing.assert_array_equal(native[k], ref[k])
            np.testing.assert_array_equal(native[k], stacked[k])

    def test_write_read_roundtrip(self, log, tmp_path):
        _, stacked = log
        path = str(tmp_path / "native.fqlog")
        io_native.save_packed(path, stacked)
        # numpy reader must accept native-written files (same format)
        back = _load_qp_log_packed_numpy(path)
        for k in stacked:
            np.testing.assert_array_equal(back[k], stacked[k])

    def test_rejects_bad_file(self, tmp_path):
        p = tmp_path / "bad.fqlog"
        p.write_bytes(b"NOPE" + b"\x00" * 64)
        with pytest.raises(ValueError):
            io_native.load_packed(str(p))

    def test_rejects_truncated_file(self, log, tmp_path):
        path, _ = log
        blob = open(path, "rb").read()
        p = tmp_path / "trunc.fqlog"
        p.write_bytes(blob[: len(blob) // 2])
        with pytest.raises(ValueError):
            io_native.load_packed(str(p))


class TestNativeDsSplit:
    def test_split_matches_numpy(self, rng):
        x = rng.normal(size=100000) * 1e3
        x[::97] = np.inf
        x[::89] = -np.inf
        hi, lo = io_native.ds_split(x)
        ref_hi = x.astype(np.float32)
        with np.errstate(invalid="ignore"):
            ref_lo = (x - ref_hi.astype(np.float64)).astype(np.float32)
        ref_lo = np.where(np.isfinite(x), ref_lo, 0.0).astype(np.float32)
        np.testing.assert_array_equal(hi, ref_hi)
        np.testing.assert_array_equal(lo, ref_lo)

    def test_split_batch_last(self, rng):
        x = rng.normal(size=(7, 5, 3)) * 10
        hi, lo = io_native.ds_split_batch_last(x)
        assert hi.shape == (5, 3, 7)
        ref = np.moveaxis(x, 0, -1)
        np.testing.assert_array_equal(hi, ref.astype(np.float32))
        np.testing.assert_allclose(
            hi.astype(np.float64) + lo.astype(np.float64), ref, atol=1e-10
        )
