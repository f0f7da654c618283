"""Unit tests for utils: uwa formulas, compute, misc, align, coding."""

import numpy as np

from echopype_tpu.utils import align, coding, compute, misc, uwa
from echopype_tpu.xrlite import DataArray


class TestUWA:
    def test_sound_speed_mackenzie_reference_point(self):
        # Mackenzie 1981 at T=27C, S=35PSU, P=10dbar (defaults in reference)
        ss = uwa.calc_sound_speed()
        # published formula value computed independently
        t, s, p = 27.0, 35.0, 10.0
        expected = (
            1448.96
            + 4.591 * t
            - 5.304e-2 * t**2
            + 2.374e-4 * t**3
            + 1.340 * (s - 35)
            + 1.630e-2 * p
            + 1.675e-7 * p**2
            - 1.025e-2 * t * (s - 35)
            - 7.139e-13 * t * p**3
        )
        np.testing.assert_allclose(ss, expected)
        assert 1520 < ss < 1550

    def test_sound_speed_azfp(self):
        ss = uwa.calc_sound_speed(temperature=10, salinity=32, pressure=50, formula_source="AZFP")
        assert 1470 < ss < 1500

    def test_absorption_am_increases_with_frequency(self):
        freqs = np.array([18e3, 38e3, 120e3, 200e3])
        ab = uwa.calc_absorption(freqs, formula_source="AM")
        assert np.all(np.diff(ab) > 0)
        assert np.all(ab > 0) and np.all(ab < 0.2)

    def test_absorption_fg(self):
        ab = uwa.calc_absorption(
            38e3, temperature=10, salinity=35, pressure=10, formula_source="FG"
        )
        assert 0.001 < ab < 0.05  # ~0.01 dB/m at 38 kHz

    def test_absorption_azfp(self):
        ab = uwa.calc_absorption(
            125e3, temperature=10, salinity=35, pressure=10, formula_source="AZFP"
        )
        assert 0.01 < ab < 0.2

    def test_works_on_dataarrays(self):
        freq = DataArray(np.array([18e3, 38e3]), ("channel",))
        ab = uwa.calc_absorption(freq, formula_source="AM")
        assert isinstance(ab, DataArray)
        assert ab.dims == ("channel",)


class TestCompute:
    def test_roundtrip(self):
        x = np.array([-80.0, -30.0, 0.0, 10.0])
        np.testing.assert_allclose(compute._lin2log(compute._log2lin(x)), x)

    def test_jax(self):
        import jax.numpy as jnp

        x = jnp.array([-50.0, -20.0])
        out = compute._lin2log(compute._log2lin(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


class TestMisc:
    def test_camelcase(self):
        assert misc.camelcase2snakecase("PulseDuration") == "pulse_duration"
        assert misc.camelcase2snakecase("SampleInterval") == "sample_interval"

    def test_depth_from_pressure(self):
        # UNESCO check value: P=10000 dbar, lat=30 -> depth ~9712.653 m
        d = misc.depth_from_pressure(10000.0, latitude=30.0)
        np.testing.assert_allclose(d, 9712.653, atol=0.5)

    def test_depth_shallow(self):
        d = misc.depth_from_pressure(10.0)
        np.testing.assert_allclose(d, 9.93, atol=0.1)


class TestAlign:
    def _times(self, n, start="2020-01-01T00:00:00"):
        return np.datetime64(start, "ns") + np.arange(n) * np.timedelta64(1, "s")

    def test_equal_times_rename(self):
        t = self._times(3)
        da = DataArray(np.array([1.0, 2.0, 3.0]), ("time1",), coords={"time1": t})
        pt = DataArray(t, ("ping_time",))
        out = align.align_to_ping_time(da, "time1", pt)
        assert out.dims == ("ping_time",)
        np.testing.assert_allclose(out.values, [1, 2, 3])

    def test_single_broadcast(self):
        t = self._times(1)
        da = DataArray(np.array([5.0]), ("time1",), coords={"time1": t})
        pt = DataArray(self._times(4), ("ping_time",))
        out = align.align_to_ping_time(da, "time1", pt)
        np.testing.assert_allclose(out.values, [5, 5, 5, 5])

    def test_interp_extrapolate(self):
        t = self._times(2)
        da = DataArray(np.array([0.0, 10.0]), ("time1",), coords={"time1": t})
        pt = DataArray(
            np.datetime64("2020-01-01T00:00:00", "ns")
            + (np.arange(4) * 500).astype("timedelta64[ms]"),
            ("ping_time",),
        )
        out = align.align_to_ping_time(da, "time1", pt)
        np.testing.assert_allclose(out.values, [0, 5, 10, 15])

    def test_empty_nan(self):
        da = DataArray(np.zeros((0,)), ("time1",), coords={"time1": self._times(0)})
        pt = DataArray(self._times(3), ("ping_time",))
        out = align.align_to_ping_time(da, "time1", pt)
        assert np.isnan(out.values).all()


class TestCoding:
    def test_time_roundtrip(self):
        t = np.datetime64("2020-06-01T12:00:00", "ns") + np.arange(5) * np.timedelta64(1, "ms")
        enc, attrs = coding.encode_array(t)
        assert enc.dtype == np.int64
        dec = coding.decode_array(enc, attrs)
        np.testing.assert_array_equal(dec, t)

    def test_decode_seconds_since(self):
        arr = np.array([0, 3600], dtype="int64")
        dec = coding.decode_array(arr, {"units": "seconds since 1970-01-01"})
        assert dec[1] == np.datetime64("1970-01-01T01:00:00", "ns")

    def test_auto_chunks(self):
        ch = coding.auto_chunks((10_000_000, 4), "f8", target_bytes=1_000_000)
        assert ch[1] == 4 and ch[0] * 4 * 8 <= 1_000_000
