"""commongrid tests: device segment-mean vs brute-force triple-loop oracles.

Mirrors the reference's test strategy (echopype/tests/mock_data.py:28-80):
synthetic Sv datasets + brute-force expected bins.
"""

import numpy as np
import pandas as pd
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import DataArray, Dataset


def make_sv_dataset(n_ch=2, n_ping=60, n_r=100, seed=0, with_latlon=True, dr=0.5):
    rng = np.random.default_rng(seed)
    ping_time = np.datetime64("2020-01-01T00:00:03", "ns") + (
        np.arange(n_ping) * np.timedelta64(2_000_000_000, "ns")
    )
    sv = rng.normal(-70, 10, (n_ch, n_ping, n_r)).astype("f4")
    er = np.broadcast_to(np.arange(n_r) * dr, (n_ch, n_ping, n_r)).copy()
    ds = Dataset(
        {
            "Sv": (("channel", "ping_time", "range_sample"), sv),
            "echo_range": (("channel", "ping_time", "range_sample"), er),
            "frequency_nominal": (("channel",), 1000.0 * (1 + np.arange(n_ch))),
        },
        coords={
            "channel": np.array([f"ch{i}" for i in range(n_ch)], dtype=object),
            "ping_time": ping_time,
            "range_sample": np.arange(n_r),
        },
        attrs={"processing_level": "Level 2A"},
    )
    if with_latlon:
        ds["latitude"] = (("ping_time",), 45.0 + np.arange(n_ping) * 1e-4)
        ds["longitude"] = (("ping_time",), -125.0 + np.arange(n_ping) * 1e-4)
    return ds


def brute_force_mvbs(ds, range_bin=10.0, ping_time_bin="20s", closed="left", skipna=True):
    """Triple-loop oracle with pandas IntervalIndex semantics."""
    sv = ds["Sv"].values.astype("f8")
    er = ds["echo_range"].values.astype("f8")
    pt = pd.DatetimeIndex(ds.coords["ping_time"].values)

    r_max = np.nanmax(er)
    r_edges = np.arange(0, r_max + range_bin, range_bin)
    d_index = pd.Series(np.zeros(len(pt)), index=pt).resample(ping_time_bin).first().index
    p_edges = d_index.union([d_index[-1] + pd.Timedelta(ping_time_bin)])

    r_iv = pd.IntervalIndex.from_breaks(r_edges, closed=closed)
    p_iv = pd.IntervalIndex.from_breaks(p_edges, closed=closed)

    C = sv.shape[0]
    out = np.full((C, len(p_iv), len(r_iv)), np.nan)
    for c in range(C):
        for pi, pint in enumerate(p_iv):
            psel = np.array([t in pint for t in pt])
            if not psel.any():
                continue
            for ri, rint in enumerate(r_iv):
                rsel = np.array(
                    [[x in rint if np.isfinite(x) else False for x in row] for row in er[c, psel]]
                )
                vals = 10 ** (sv[c, psel][rsel] / 10)
                if len(vals):
                    out[c, pi, ri] = 10 * np.log10(np.nanmean(vals) if skipna else np.mean(vals))
    return out, p_edges, r_edges


class TestMVBS:
    def test_matches_bruteforce(self):
        ds = make_sv_dataset(n_ch=2, n_ping=30, n_r=40)
        mvbs = ep.commongrid.compute_MVBS(ds, range_bin="10m", ping_time_bin="20s")
        expected, p_edges, r_edges = brute_force_mvbs(ds, 10.0, "20s")
        np.testing.assert_allclose(mvbs["Sv"].values, expected, atol=1e-4, rtol=0)
        np.testing.assert_array_equal(
            mvbs.coords["ping_time"].values, np.asarray(p_edges[:-1].values)
        )
        np.testing.assert_allclose(mvbs.coords["echo_range"].values, r_edges[:-1])

    def test_closed_right(self):
        ds = make_sv_dataset(n_ch=1, n_ping=20, n_r=30)
        mvbs = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="20s", closed="right")
        expected, _, _ = brute_force_mvbs(ds, 5.0, "20s", closed="right")
        np.testing.assert_allclose(mvbs["Sv"].values, expected, atol=1e-4, rtol=0)

    def test_skipna_false_poisons_bins(self):
        ds = make_sv_dataset(n_ch=1, n_ping=20, n_r=30)
        ds.data_vars["Sv"].values[0, 0, 5] = np.nan
        mvbs_t = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="20s", skipna=True)
        mvbs_f = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="20s", skipna=False)
        # the bin containing the NaN differs: finite with skipna, NaN without
        assert np.isfinite(mvbs_t["Sv"].values[0, 0, 0])
        assert np.isnan(mvbs_f["Sv"].values[0, 0, 0])

    def test_positions_reduced(self):
        ds = make_sv_dataset()
        mvbs = ep.commongrid.compute_MVBS(ds)
        assert "latitude" in mvbs and "longitude" in mvbs
        lat = mvbs["latitude"].values
        assert lat.shape == (mvbs.sizes["ping_time"],)
        assert np.nanmin(lat) >= 45.0 and np.nanmax(lat) <= 45.0 + 60e-4

    def test_attrs_and_level(self):
        ds = make_sv_dataset()
        mvbs = ep.commongrid.compute_MVBS(ds, range_bin="20m", ping_time_bin="20s")
        assert mvbs.attrs["processing_function"] == "commongrid.compute_MVBS"
        assert mvbs.attrs["processing_level"] == "Level 3A"  # has lat/lon
        assert "cell_methods" in mvbs.data_vars["Sv"].attrs
        # input level is consumed when the wildcard resolves (reference parity)
        assert "input_processing_level" not in mvbs.attrs

    def test_no_latlon_level_b(self):
        ds = make_sv_dataset(with_latlon=False)
        mvbs = ep.commongrid.compute_MVBS(ds)
        # without location data no level is stamped at all (reference gating)
        assert "processing_level" not in mvbs.attrs
        # sublevel B comes from a denoised (L2B) input WITH location data
        ds_b = make_sv_dataset()
        ds_b.attrs["processing_level"] = "Level 2B"
        mvbs_b = ep.commongrid.compute_MVBS(ds_b)
        assert mvbs_b.attrs["processing_level"] == "Level 3B"

    def test_range_var_max(self):
        ds = make_sv_dataset(n_r=40, dr=0.5)
        mvbs = ep.commongrid.compute_MVBS(ds, range_bin="10m", range_var_max="30m")
        # bins 0,10,20,30 -> 3+1 bins (30 + epsilon -> edge at 30 included)
        assert mvbs.sizes["echo_range"] in (3, 4)

    def test_bad_inputs(self):
        ds = make_sv_dataset()
        with pytest.raises(ValueError):
            ep.commongrid.compute_MVBS(ds, range_bin="10 parsecs")
        with pytest.raises(TypeError):
            ep.commongrid.compute_MVBS(ds, ping_time_bin=20)
        with pytest.raises(ValueError):
            ep.commongrid.compute_MVBS(ds, closed="both")
        with pytest.raises(ValueError):
            ep.commongrid.compute_MVBS(ds, range_var="depth")  # no depth var


class TestMVBSIndexBinning:
    def test_matches_bruteforce(self):
        ds = make_sv_dataset(n_ch=1, n_ping=25, n_r=35)
        out = ep.commongrid.compute_MVBS_index_binning(ds, range_sample_num=10, ping_num=10)
        sv = ds["Sv"].values.astype("f8")
        # brute force: pad to boundary, linear mean
        svp = np.pad(sv, ((0, 0), (0, 5), (0, 5)), constant_values=np.nan)
        lin = 10 ** (svp / 10)
        expected = 10 * np.log10(
            np.nanmean(lin.reshape(1, 3, 10, 4, 10), axis=(2, 4))
        )
        np.testing.assert_allclose(out["Sv"].values, expected, atol=1e-5)
        assert out.sizes == {"channel": 1, "ping_time": 3, "range_sample": 4}


class TestNASC:
    def test_constant_sv_analytic(self):
        """Constant Sv + uniform depth grid -> NASC = sv_lin * H * 4 pi 1852^2."""
        n_ping, n_r = 40, 50
        ds = make_sv_dataset(n_ch=1, n_ping=n_ping, n_r=n_r, dr=0.5)
        ds.data_vars["Sv"].values[:] = -60.0
        ds["depth"] = (("channel", "ping_time", "range_sample"), ds["echo_range"].values)
        nasc = ep.commongrid.compute_NASC(ds, range_bin="10m", dist_bin="0.5nmi")
        v = nasc["NASC"].values
        # every full 10-m depth bin with constant Sv: mean_sv*h*4pi*1852^2
        sv_lin = 10 ** (-60.0 / 10)
        expected = sv_lin * 10.0 * 4 * np.pi * 1852**2
        # first bin's height is slightly less (diff loses one sample)
        full_bins = v[0, 0, 1 : (n_r // 20) - 1]
        np.testing.assert_allclose(full_bins, expected, rtol=0.02)
        assert nasc.attrs["processing_function"] == "commongrid.compute_NASC"
        assert "geospatial_lat_min" in nasc.attrs

    def test_requires_depth(self):
        ds = make_sv_dataset()
        with pytest.raises(ValueError):
            ep.commongrid.compute_NASC(ds)

    def test_distance_monotonic(self):
        from echopype_tpu.commongrid.utils import get_distance_from_latlon

        ds = make_sv_dataset()
        d = get_distance_from_latlon(ds)
        assert np.all(np.diff(d[~np.isnan(d)]) >= 0)
        # ~1e-4 deg per ping move at 45N: roughly 13 m per step
        assert 0.0001 < np.nanmax(d) < 1.0


class TestGeodesy:
    def test_vincenty_known_distance(self):
        from echopype_tpu.utils.geodesy import vincenty_inverse_m

        # 1 degree of latitude at the equator ~ 110574 m (WGS-84)
        d = vincenty_inverse_m(0.0, 0.0, 1.0, 0.0)
        np.testing.assert_allclose(d, 110574.4, atol=5.0)
        # 1 degree of longitude at 60N ~ 55800 m
        d2 = vincenty_inverse_m(60.0, 0.0, 60.0, 1.0)
        np.testing.assert_allclose(d2, 55800.0, atol=100.0)

    def test_zero_distance(self):
        from echopype_tpu.utils.geodesy import vincenty_inverse_m

        assert vincenty_inverse_m(45.0, -125.0, 45.0, -125.0) == 0.0


class TestQuietBinPrecision:
    def test_quiet_bin_after_loud_pings(self):
        """A quiet bin following loud pings must match a float64 oracle.

        This is the failure mode of the former f32 prefix-sum ping reduction:
        cumsum cancellation distorted bins ~1e6x below the running total by
        up to ~0.16 dB. The windowed matmul reduction accumulates each bin
        independently (ops/binning.banded_x_reduce).
        """
        import echopype_tpu as ep
        from echopype_tpu.xrlite import DataArray, Dataset

        rng = np.random.default_rng(9)
        P, R = 120, 64
        pt = np.datetime64("2021-01-01", "ns") + np.arange(P).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        sv = np.full((1, P, R), -20.0, dtype="f4")  # loud start
        sv[:, 80:] = -100.0  # quiet tail: 8 orders below in linear
        sv += rng.normal(0, 1, sv.shape).astype("f4")
        er = np.broadcast_to(np.arange(R, dtype="f4") * 0.5, (1, P, R)).copy()
        ds = Dataset(
            coords={
                "channel": np.asarray(["ch"], dtype=object),
                "ping_time": pt,
                "range_sample": np.arange(R),
            }
        )
        ds["Sv"] = (("channel", "ping_time", "range_sample"), sv)
        ds["echo_range"] = (("channel", "ping_time", "range_sample"), er)
        ds["frequency_nominal"] = (("channel",), np.array([38000.0]))

        got = np.asarray(
            ep.commongrid.compute_MVBS(ds, range_bin="8m", ping_time_bin="20s")["Sv"].values
        )

        # float64 brute-force oracle
        edges_t = np.arange(0, P + 20, 20)
        edges_r = np.arange(0, er.max() + 8.0, 8.0)
        want = np.full((1, len(edges_t) - 1, len(edges_r) - 1), np.nan)
        lin = 10.0 ** (sv.astype("f8") / 10.0)
        for i in range(len(edges_t) - 1):
            psel = slice(edges_t[i], min(edges_t[i + 1], P))
            for j in range(len(edges_r) - 1):
                rsel = (er[0, 0] >= edges_r[j]) & (er[0, 0] < edges_r[j + 1])
                block = lin[0, psel][:, rsel]
                if block.size:
                    want[0, i, j] = 10 * np.log10(block.mean())
        n_t = min(got.shape[1], want.shape[1])
        n_r = min(got.shape[2], want.shape[2])
        np.testing.assert_allclose(
            got[:, :n_t, :n_r], want[:, :n_t, :n_r], rtol=0, atol=2e-5, equal_nan=True
        )
