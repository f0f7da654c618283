"""mask package tests."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import DataArray, Dataset


def make_sv(n_ch=2, n_ping=20, n_r=30, seed=0):
    rng = np.random.default_rng(seed)
    sv = rng.normal(-70, 5, (n_ch, n_ping, n_r))
    ds = Dataset(
        {
            "Sv": (("channel", "ping_time", "range_sample"), sv),
            "frequency_nominal": (("channel",), np.array([18000.0, 38000.0][:n_ch])),
            "depth": (
                ("channel", "ping_time", "range_sample"),
                np.broadcast_to(np.arange(n_r) * 1.0, (n_ch, n_ping, n_r)).copy(),
            ),
        },
        coords={
            "channel": np.array(["chan1", "chan2"][:n_ch], dtype=object),
            "ping_time": np.datetime64("2020-01-01", "ns")
            + np.arange(n_ping) * np.timedelta64(1, "s"),
            "range_sample": np.arange(n_r),
        },
        attrs={"processing_level": "Level 2A"},
    )
    return ds


class TestApplyMask:
    def test_basic_2d_mask(self):
        ds = make_sv()
        m = DataArray(
            np.ones((20, 30), dtype=bool), ("ping_time", "range_sample"),
        )
        m.values[5, :] = False
        out = ep.mask.apply_mask(ds, m)
        assert np.isnan(out["Sv"].values[:, 5, :]).all()
        assert np.isfinite(out["Sv"].values[:, 6, :]).all()

    def test_mask_list_and_combine(self):
        ds = make_sv()
        m1 = DataArray(np.ones((20, 30), dtype=bool), ("ping_time", "range_sample"))
        m2 = DataArray(np.ones((20, 30), dtype=bool), ("ping_time", "range_sample"))
        m1.values[3] = False
        m2.values[7] = False
        out = ep.mask.apply_mask(ds, [m1, m2], fill_value=-999.0)
        assert (out["Sv"].values[:, 3] == -999.0).all()
        assert (out["Sv"].values[:, 7] == -999.0).all()
        assert np.isfinite(out["Sv"].values[:, 5]).all()

    def test_channel_mask(self):
        ds = make_sv()
        m = DataArray(np.ones((2, 20, 30), dtype=bool), ("channel", "ping_time", "range_sample"))
        m.values[1] = False
        out = ep.mask.apply_mask(ds, m)
        assert np.isfinite(out["Sv"].values[0]).all()
        assert np.isnan(out["Sv"].values[1]).all()

    def test_nan_in_mask_is_false(self):
        ds = make_sv()
        m = DataArray(np.ones((20, 30)), ("ping_time", "range_sample"))
        m.values[2, 4] = np.nan
        out = ep.mask.apply_mask(ds, m)
        assert np.isnan(out["Sv"].values[0, 2, 4])

    def test_non_boolean_mask_raises(self):
        ds = make_sv()
        m = DataArray(np.full((20, 30), 0.5), ("ping_time", "range_sample"))
        with pytest.raises(ValueError):
            ep.mask.apply_mask(ds, m)

    def test_shape_mismatch_raises(self):
        ds = make_sv()
        m = DataArray(np.ones((10, 30), dtype=bool), ("ping_time", "range_sample"))
        with pytest.raises(ValueError):
            ep.mask.apply_mask(ds, m)

    def test_prov_attrs(self):
        ds = make_sv()
        m = DataArray(np.ones((20, 30), dtype=bool), ("ping_time", "range_sample"))
        out = ep.mask.apply_mask(ds, m)
        assert out.attrs["mask_function"] == "mask.apply_mask"
        # no lat/lon -> wildcard stamp withheld (inherited attr stays) and
        # the input_processing_level marker is consumed
        assert out.attrs["processing_level"] == "Level 2A"
        assert "input_processing_level" not in out.attrs
        n_ping = ds.sizes["ping_time"]
        ds["latitude"] = (("ping_time",), 45.0 + np.arange(n_ping) * 1e-4)
        ds["longitude"] = (("ping_time",), -125.0 + np.arange(n_ping) * 1e-4)
        out = ep.mask.apply_mask(ds, m)
        assert out.attrs["processing_level"] == "Level 3A"


class TestFrequencyDifferencing:
    def test_chan_equation(self):
        ds = make_sv()
        ds.data_vars["Sv"].values[0] = -50.0
        ds.data_vars["Sv"].values[1] = -70.0
        m = ep.mask.frequency_differencing(ds, chanABEq='"chan1" - "chan2" > 10.0dB')
        assert m.values.all()
        assert m.dims == ("ping_time", "range_sample")
        m2 = ep.mask.frequency_differencing(ds, chanABEq='"chan1" - "chan2" > 30.0dB')
        assert not m2.values.any()

    def test_freq_equation_khz(self):
        ds = make_sv()
        ds.data_vars["Sv"].values[0] = -50.0
        ds.data_vars["Sv"].values[1] = -58.0
        m = ep.mask.frequency_differencing(ds, freqABEq="18kHz - 38kHz >= 8.0dB")
        assert m.values.all()

    def test_eq_validation(self):
        ds = make_sv()
        with pytest.raises(ValueError):
            ep.mask.frequency_differencing(ds)
        with pytest.raises(ValueError):
            ep.mask.frequency_differencing(
                ds, freqABEq="18kHz - 38kHz > 5dB", chanABEq='"a" - "b" > 5dB'
            )
        with pytest.raises(TypeError):
            ep.mask.frequency_differencing(ds, freqABEq="18 - 38 > 5")
        with pytest.raises(ValueError):
            ep.mask.frequency_differencing(ds, freqABEq="99kHz - 38kHz > 5.0dB")

    def test_operator_semantics(self):
        ds = make_sv()
        ds.data_vars["Sv"].values[0] = -60.0
        ds.data_vars["Sv"].values[1] = -65.0
        m = ep.mask.frequency_differencing(ds, chanABEq='"chan1" - "chan2" == 5.0dB')
        assert m.values.all()


class TestRegridMask:
    def test_and_or(self):
        ds = make_sv(n_ch=1)
        mask = DataArray(
            np.zeros((20, 30), dtype=bool),
            ("ping_time", "depth"),
            coords={"ping_time": ds.coords["ping_time"].values},
        )
        mask.values[:, :10] = True  # top 10 m fully true
        mask.values[0, 15] = True  # single isolated true
        range_da = DataArray(
            np.broadcast_to(np.arange(30) * 1.0, (20, 30)).copy(),
            ("ping_time", "depth"),
            name="depth",
        )
        out_and = ep.mask.regrid_mask(mask, range_da, range_bin="10m", ping_time_bin="5s",
                                      func="logical-AND")
        out_or = ep.mask.regrid_mask(mask, range_da, range_bin="10m", ping_time_bin="5s",
                                     func="logical-OR")
        assert out_and.values[:, 0].all()  # fully-true bins survive AND
        assert not out_and.values[:, 1].any()  # partially-true bin fails AND
        assert out_or.values[0, 1]  # partially-true bin passes OR

    def test_bad_func(self):
        ds = make_sv(n_ch=1)
        mask = DataArray(np.zeros((20, 30), dtype=bool), ("ping_time", "depth"),
                         coords={"ping_time": ds.coords["ping_time"].values})
        range_da = DataArray(np.arange(30) * 1.0, ("depth",), name="depth")
        with pytest.raises(ValueError):
            ep.mask.regrid_mask(mask, range_da, func="AND")


class TestDetectSeafloor:
    def test_basic(self):
        ds = make_sv(n_ch=1, n_ping=10, n_r=50)
        # seafloor echo at sample 30 (depth 30m)
        ds.data_vars["Sv"].values[:, :, 30:33] = -20.0
        bottom = ep.mask.detect_seafloor(
            ds,
            method="basic",
            params={"channel": "chan1", "threshold": (-25.0, -15.0),
                    "offset_m": 0.0, "bin_skip_from_surface": 5},
        )
        np.testing.assert_allclose(bottom.values, 30.0)
        assert bottom.attrs["detector"] == "basic"

    def test_blackwell(self):
        ds = make_sv(n_ch=1, n_ping=60, n_r=80)
        ds.data_vars["Sv"].values[:] = -90.0
        # bottom at 50 m: strong Sv (with variance, so some samples exceed the
        # adaptive angle-masked median) and strong angles below
        rng = np.random.default_rng(7)
        ds.data_vars["Sv"].values[:, :, 50:] = rng.normal(-20.0, 5.0, (1, 60, 30))
        ang = np.zeros((1, 60, 80))
        ang[:, :, 50:] = 40.0
        ds["angle_alongship"] = (("channel", "ping_time", "range_sample"), ang)
        ds["angle_athwartship"] = (("channel", "ping_time", "range_sample"), ang)
        bottom = ep.mask.detect_seafloor(
            ds, method="blackwell",
            params={"channel": "chan1", "r0": 1.0, "r1": 79.0, "threshold": -40.0},
        )
        np.testing.assert_allclose(bottom.values, 50.0, atol=6.0)

    def test_unknown_method(self):
        ds = make_sv()
        with pytest.raises(ValueError):
            ep.mask.detect_seafloor(ds, method="magic")


class TestDetectShoal:
    def test_weill_gap_fill_and_size(self):
        ds = make_sv(n_ch=1, n_ping=30, n_r=40)
        ds.data_vars["Sv"].values[:] = -90.0
        # a shoal: pings 10-20, samples 10-20, with a small internal gap
        ds.data_vars["Sv"].values[0, 10:20, 10:20] = -50.0
        ds.data_vars["Sv"].values[0, 14, 13:16] = -90.0  # horizontal gap in 3 rows
        m = ep.mask.detect_shoal(
            ds, method="weill",
            params={"channel": "chan1", "thr": -60.0, "maxvgap": 4, "maxhgap": 2},
        )
        assert m.values[12, 15]
        assert m.values[14, 14]  # gap filled
        assert not m.values[2, 2]

    def test_echoview_removes_small(self):
        ds = make_sv(n_ch=1, n_ping=30, n_r=40)
        ds.data_vars["Sv"].values[:] = -90.0
        ds.data_vars["Sv"].values[0, 10:20, 10:20] = -50.0  # big shoal
        ds.data_vars["Sv"].values[0, 2, 2] = -50.0  # single-sample blip
        m = ep.mask.detect_shoal(
            ds, method="echoview",
            params={"channel": "chan1", "thr": -60.0, "mincan": (2, 2),
                    "maxlink": (2, 2), "minsho": (2, 2)},
        )
        assert m.values[15, 15]
        assert not m.values[2, 2]
