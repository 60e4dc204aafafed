"""Native loader extension tests (skipped when no C compiler is available)."""

import numpy as np
import pytest

from ovr_tpu.core.types import ValueType, normalize_array
from ovr_tpu.native import loader as native_loader


def _native_available():
    return native_loader._build_and_import() is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native extension unavailable")


@pytest.mark.parametrize("vtype,arr", [
    (ValueType.UINT8, np.array([0, 128, 255], np.uint8)),
    (ValueType.INT8, np.array([-128, -127, 0, 127], np.int8)),
    (ValueType.UINT16, np.array([0, 40000, 65535], np.uint16)),
    (ValueType.INT16, np.array([-32768, -1, 32767], np.int16)),
    (ValueType.UINT32, np.array([0, 7, 4000000000], np.uint32)),
    (ValueType.INT32, np.array([-5, 0, 2000000000], np.int32)),
    (ValueType.FLOAT, np.array([-1.5, 0.25, 3e7], np.float32)),
    (ValueType.DOUBLE, np.array([-1.5, 0.25, 3e7], np.float64)),
])
def test_native_matches_numpy(tmp_path, vtype, arr):
    path = tmp_path / "v.raw"
    arr.tofile(path)
    got = native_loader.load_raw(str(path), arr.size, vtype.dtype.char, 0,
                                 False)
    want = normalize_array(arr, vtype)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_big_endian_offset(tmp_path):
    arr = np.array([1.0, -2.0, 3.5], np.float32)
    path = tmp_path / "v.raw"
    with open(path, "wb") as f:
        f.write(b"\x00" * 7)  # unaligned offset
        f.write(arr.astype(">f4").tobytes())
    got = native_loader.load_raw(str(path), 3, "f", 7, True)
    np.testing.assert_array_equal(got, arr)


def test_native_integrated_in_io(tmp_path, rng):
    """io.raw.load_raw_volume must produce identical results whichever path
    (native or numpy) serves it."""
    from ovr_tpu.io.raw import load_raw_volume

    data = rng.integers(0, 65535, size=(6, 5, 4), dtype=np.uint16)
    path = tmp_path / "v.raw"
    data.tofile(path)
    grid, _ = load_raw_volume(str(path), (4, 5, 6), ValueType.UINT16,
                              native_dtype=False)
    np.testing.assert_allclose(grid, data.astype(np.float32) / 65535.0)
    # native residency (default): raw u16 + normalized value range
    grid_n, vr = load_raw_volume(str(path), (4, 5, 6), ValueType.UINT16)
    assert grid_n.dtype == np.uint16
    np.testing.assert_array_equal(grid_n, data)
    assert abs(vr[1] - data.max() / 65535.0) < 1e-6


def test_native_error_on_short_file(tmp_path):
    path = tmp_path / "v.raw"
    np.zeros(2, np.float32).tofile(path)
    with pytest.raises((ValueError, ImportError)):
        native_loader.load_raw(str(path), 100, "f", 0, False)
