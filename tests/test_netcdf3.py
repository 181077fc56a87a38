"""Unit tests for the pure-numpy NetCDF-3 classic codec (netcdf3.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gridfia_spark import netcdf3


def _roundtrip(dims, variables, gattrs=None, vattrs=None):
    blob = netcdf3.write_netcdf3(dims, variables, gattrs, vattrs)
    return blob, netcdf3.read_netcdf3(blob)


class TestNetcdf3:
    def test_magic_and_header_layout(self):
        blob = netcdf3.write_netcdf3({"x": 2}, {"x": (("x",), np.arange(2.0))})
        assert blob[:4] == b"CDF\x01"
        # numrecs (0), then NC_DIMENSION tag + count
        assert struct.unpack_from(">iii", blob, 4) == (0, 0x0A, 1)
        assert len(blob) % 4 == 0

    def test_full_roundtrip(self):
        y = -900_000.0 - np.arange(3, dtype=np.float64) * 30.0
        x = -2_000_000.0 + np.arange(5, dtype=np.float64) * 30.0
        v = np.arange(15, dtype=np.int32).reshape(3, 5)
        blob, (dims, vars_, gattrs, vattrs) = _roundtrip(
            {"y": 3, "x": 5},
            {"y": (("y",), y), "x": (("x",), x), "m": (("y", "x"), v)},
            {"crs": "ESRI:102039", "units": "Mg/ha"},
            {"m": {"units": "Mg/ha"}},
        )
        assert dims == {"y": 3, "x": 5}
        assert vars_["m"][0] == ("y", "x")
        np.testing.assert_array_equal(vars_["m"][1], v)
        np.testing.assert_array_equal(vars_["y"][1], y)
        np.testing.assert_array_equal(vars_["x"][1], x)
        assert gattrs == {"crs": "ESRI:102039", "units": "Mg/ha"}
        assert vattrs["m"]["units"] == "Mg/ha"

    def test_numeric_attrs_roundtrip(self):
        _, (_, _, gattrs, _) = _roundtrip(
            {"x": 1},
            {"x": (("x",), np.zeros(1))},
            {"scale": np.float64(0.5), "levels": np.array([1, 2, 3], np.int32)},
        )
        assert gattrs["scale"] == 0.5
        np.testing.assert_array_equal(gattrs["levels"], [1, 2, 3])

    def test_dtype_mapping(self):
        for dt, nct in [("i1", 1), ("i2", 3), ("i4", 4), ("f4", 5), ("f8", 6)]:
            arr = np.ones(4, dtype=dt)
            _, (_, vars_, _, _) = _roundtrip({"x": 4}, {"v": (("x",), arr)})
            got = vars_["v"][1]
            np.testing.assert_array_equal(got, arr)
            assert netcdf3._nc_type_of(arr) == nct

    def test_int64_widens_or_raises(self):
        ok = np.array([1, 2**31 - 1], dtype=np.int64)
        _, (_, vars_, _, _) = _roundtrip({"x": 2}, {"v": (("x",), ok)})
        np.testing.assert_array_equal(vars_["v"][1], ok)
        with pytest.raises(ValueError, match="NC_INT range"):
            netcdf3.write_netcdf3({"x": 1}, {"v": (("x",), np.array([2**40]))})

    def test_unsigned_widens_to_next_signed(self):
        """ADVICE r4: u1/u2 must widen (u1->NC_SHORT, u2->NC_INT) so
        high-bit values survive instead of wrapping negative."""
        u8 = np.array([0, 127, 128, 255], dtype=np.uint8)
        assert netcdf3._nc_type_of(u8) == 3  # NC_SHORT
        _, (_, vars_, _, _) = _roundtrip({"x": 4}, {"v": (("x",), u8)})
        np.testing.assert_array_equal(vars_["v"][1], u8.astype(np.int16))
        u16 = np.array([0, 2**15, 2**16 - 1], dtype=np.uint16)
        assert netcdf3._nc_type_of(u16) == 4  # NC_INT
        _, (_, vars_, _, _) = _roundtrip({"x": 3}, {"v": (("x",), u16)})
        np.testing.assert_array_equal(vars_["v"][1], u16.astype(np.int32))

    def test_unsigned_wide_range_checked(self):
        ok = np.array([0, 2**31 - 1], dtype=np.uint32)
        _, (_, vars_, _, _) = _roundtrip({"x": 2}, {"v": (("x",), ok)})
        np.testing.assert_array_equal(vars_["v"][1], ok.astype(np.int32))
        for dt in (np.uint32, np.uint64):
            with pytest.raises(ValueError, match="NC_INT range"):
                netcdf3.write_netcdf3(
                    {"x": 1}, {"v": (("x",), np.array([2**31], dtype=dt))}
                )

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape"):
            netcdf3.write_netcdf3({"x": 3}, {"v": (("x",), np.zeros(4))})

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError, match="classic"):
            netcdf3.read_netcdf3(b"HDF5....")

    def test_odd_name_lengths_pad(self):
        # names whose byte length is not a multiple of 4 exercise padding
        _, (dims, vars_, gattrs, _) = _roundtrip(
            {"lat": 2, "longitude": 3},
            {"t2m_k": (("lat", "longitude"), np.ones((2, 3), np.float32))},
            {"a": "b", "ccc": "dddddd"},
        )
        assert dims == {"lat": 2, "longitude": 3}
        assert vars_["t2m_k"][0] == ("lat", "longitude")
        assert gattrs == {"a": "b", "ccc": "dddddd"}

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 7),
        w=st.integers(1, 9),
        data=st.data(),
        dt=st.sampled_from(["i2", "i4", "f4", "f8"]),
    )
    def test_roundtrip_hypothesis(self, h, w, data, dt):
        if dt.startswith("i"):
            lo, hi = (-(2**15), 2**15 - 1) if dt == "i2" else (-(2**31), 2**31 - 1)
            vals = data.draw(
                st.lists(st.integers(lo, hi), min_size=h * w, max_size=h * w)
            )
        else:
            vals = data.draw(
                st.lists(
                    st.floats(-1e6, 1e6, allow_nan=False, width=32),
                    min_size=h * w,
                    max_size=h * w,
                )
            )
        arr = np.array(vals, dtype=dt).reshape(h, w)
        _, (dims, vars_, _, _) = _roundtrip({"y": h, "x": w}, {"v": (("y", "x"), arr)})
        np.testing.assert_array_equal(vars_["v"][1], arr)


def test_truncation_raises_valueerror_only():
    blob = netcdf3.write_netcdf3(
        {"x": 4}, {"x": (("x",), np.arange(4.0))}, {"a": "b"}
    )
    for k in range(len(blob)):
        with pytest.raises(ValueError):
            netcdf3.read_netcdf3(blob[:k])
