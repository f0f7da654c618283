"""Reference-differential parity for commongrid (MVBS / NASC) numerics.

The reference's binning core — flox ``xarray_reduce`` map-reduce groupby over
pandas IntervalIndex bins (reference: commongrid/utils.py:614-627) — executes
on our datasets through the xarray facade plus the numpy flox shim
(echopype_tpu/xrlite/flox_compat.py).  Our windowed-matmul binning kernels
must match the reference bin-for-bin, including NaN-coordinate drops, empty
bins, skipna=False poisoning, and custom fill values.
"""

import numpy as np
import pandas as pd
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import Dataset

from ref_oracle import load_ref
from test_ref_postprocess import make_sv_ds


def ping_interval_edges(pt, ping_time_bin):
    """Replicate reference commongrid/api.py:118-124 with pandas directly."""
    s = pd.Series(np.zeros(len(pt)), index=pd.DatetimeIndex(pt))
    d_index = s.resample(ping_time_bin).first().index
    return d_index.union([d_index[-1] + pd.Timedelta(ping_time_bin)]).values


def _mvbs_oracle(ds, range_bin_m, ping_time_bin, closed="left", skipna=True,
                 fill_value=np.nan, range_var="echo_range"):
    """Run the reference compute_raw_MVBS on ``ds`` via the facade."""
    ref_u = load_ref("commongrid/utils")
    er = np.asarray(ds[range_var].values, dtype="f8")
    range_edges = np.arange(0, np.nanmax(er) + range_bin_m, range_bin_m)
    ping_edges = ping_interval_edges(
        np.asarray(ds.coords["ping_time"].values), ping_time_bin
    )
    ping_iv = ref_u._convert_bins_to_interval_index(ping_edges, closed=closed)
    range_iv = ref_u._convert_bins_to_interval_index(range_edges, closed=closed)
    raw = ref_u.compute_raw_MVBS(
        ds, range_iv, ping_iv, range_var=range_var,
        skipna=skipna, fill_value=fill_value,
    )
    return raw


class TestMVBSDifferential:
    def test_compute_mvbs_matches_reference(self):
        ds = make_sv_ds(n_ch=3, n_ping=37, n_r=55, seed=11)
        # ragged NaN injection: dead samples + one NaN echo_range column
        sv = np.asarray(ds["Sv"].values)
        sv[0, 5:9, 10:14] = np.nan
        sv[2, -1, :] = np.nan
        raw = _mvbs_oracle(ds, 5.0, "7s")
        want = np.asarray(raw["Sv"].values, dtype="f8")

        got_ds = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="7s")
        got = np.asarray(got_ds["Sv"].values, dtype="f8")

        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)
        # coords: our output uses bin LEFT edges, like the reference api
        # (reference: commongrid/api.py:146-153)
        ref_pt = np.array([v.left for v in raw["ping_time_bins"].values])
        ref_er = np.array([v.left for v in raw["echo_range_bins"].values])
        np.testing.assert_array_equal(
            np.asarray(got_ds.coords["ping_time"].values), ref_pt.astype("datetime64[ns]")
        )
        np.testing.assert_allclose(
            np.asarray(got_ds.coords["echo_range"].values, dtype="f8"), ref_er
        )

    def test_nan_range_coordinate_dropped(self):
        """flox drops samples whose binning coordinate is NaN; so must we."""
        ds = make_sv_ds(n_ch=2, n_ping=16, n_r=30, seed=3)
        er = np.asarray(ds["echo_range"].values)
        er[1, 3:7, 20:] = np.nan
        raw = _mvbs_oracle(ds, 4.0, "5s")
        got_ds = ep.commongrid.compute_MVBS(ds, range_bin="4m", ping_time_bin="5s")
        np.testing.assert_allclose(
            np.asarray(got_ds["Sv"].values, dtype="f8"),
            np.asarray(raw["Sv"].values, dtype="f8"),
            atol=2e-5, rtol=0,
        )

    def test_skipna_false_poisons_bins(self):
        ds = make_sv_ds(n_ch=2, n_ping=12, n_r=24, seed=5)
        sv = np.asarray(ds["Sv"].values)
        sv[0, 2, 3] = np.nan
        raw = _mvbs_oracle(ds, 3.0, "4s", skipna=False)
        got_ds = ep.commongrid.compute_MVBS(
            ds, range_bin="3m", ping_time_bin="4s", skipna=False
        )
        want = np.asarray(raw["Sv"].values, dtype="f8")
        got = np.asarray(got_ds["Sv"].values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        np.testing.assert_allclose(got[m], want[m], atol=2e-5, rtol=0)

    def test_fill_value(self):
        ds = make_sv_ds(n_ch=2, n_ping=10, n_r=20, seed=7)
        # leave a gap in ping_time so an empty time bin exists
        pt = np.asarray(ds.coords["ping_time"].values).copy()
        pt[5:] += np.timedelta64(30, "s")
        ds.coords["ping_time"].values = pt
        # fill is linear-domain (1e-10 -> -100 dB after the reference's
        # lin2log pipe, commongrid/utils.py:92)
        raw = _mvbs_oracle(ds, 4.0, "5s", fill_value=1e-10)
        got_ds = ep.commongrid.compute_MVBS(
            ds, range_bin="4m", ping_time_bin="5s", fill_value=1e-10
        )
        want = np.asarray(raw["Sv"].values, dtype="f8")
        got = np.asarray(got_ds["Sv"].values, dtype="f8")
        assert (want == -100.0).any(), "oracle should contain filled empty bins"
        both = ~(np.isnan(want) | np.isnan(got))
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(got[both], want[both], atol=2e-5, rtol=0)

    def test_closed_right(self):
        ds = make_sv_ds(n_ch=2, n_ping=14, n_r=25, seed=9)
        # land samples exactly on bin edges so closed-ness matters
        er = np.asarray(ds["echo_range"].values)
        er[:] = np.broadcast_to(np.arange(25) * 1.0, er.shape)
        raw = _mvbs_oracle(ds, 5.0, "6s", closed="right")
        got_ds = ep.commongrid.compute_MVBS(
            ds, range_bin="5m", ping_time_bin="6s", closed="right"
        )
        np.testing.assert_allclose(
            np.asarray(got_ds["Sv"].values, dtype="f8"),
            np.asarray(raw["Sv"].values, dtype="f8"),
            atol=2e-5, rtol=0,
        )


class TestMVBSIndexBinningDifferential:
    def test_index_binning_matches_reference(self):
        ds = make_sv_ds(n_ch=2, n_ping=23, n_r=47, seed=13)
        sv = np.asarray(ds["Sv"].values)
        sv[1, 4, 7:12] = np.nan
        ref_api = load_ref("commongrid/api")
        want = ref_api.compute_MVBS_index_binning(ds, range_sample_num=10, ping_num=6)
        got = ep.commongrid.compute_MVBS_index_binning(
            ds, range_sample_num=10, ping_num=6
        )
        np.testing.assert_allclose(
            np.asarray(got["Sv"].values, dtype="f8"),
            np.asarray(want["Sv"].values, dtype="f8"),
            atol=2e-5, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(got["echo_range"].values, dtype="f8"),
            np.asarray(want["echo_range"].values, dtype="f8"),
            atol=0, rtol=0,
        )
        np.testing.assert_array_equal(
            np.asarray(got.coords["range_sample"].values),
            np.asarray(want.coords["range_sample"].values),
        )


def make_nasc_ds(n_ch=2, n_ping=40, n_r=35, seed=21):
    """Sv dataset with depth + lat/lon for NASC."""
    ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
    rng = np.random.default_rng(seed + 1)
    depth = np.asarray(ds["echo_range"].values) + 2.0
    ds["depth"] = (("channel", "ping_time", "range_sample"), depth)
    lat = 45.0 + np.cumsum(rng.uniform(1e-4, 3e-4, n_ping))
    lon = -125.0 + np.cumsum(rng.uniform(1e-4, 2e-4, n_ping))
    ds["latitude"] = (("ping_time",), lat)
    ds["longitude"] = (("ping_time",), lon)
    # with valid lat/lon the L3* stamp needs the input's level (prov rules)
    ds.attrs["processing_level"] = "Level 2A"
    return ds


class TestNASCDifferential:
    def test_compute_nasc_core_matches_reference(self):
        """Reference compute_raw_NASC vs our compute_NASC on shared distances.

        Both sides consume the same cumulative distance (ours from
        utils/geodesy), isolating the binning + mean-height numerics
        (reference: commongrid/utils.py:97-207).
        """
        ds = make_nasc_ds()
        ref_u = load_ref("commongrid/utils")
        from echopype_tpu.commongrid.utils import get_distance_from_latlon

        dist_nmi = np.asarray(get_distance_from_latlon(ds), dtype="f8")
        dist_bin, range_bin = 0.05, 4.0

        # reference path: swap ping_time -> distance_nmi then reduce
        ds_ref = ds.assign_coords({"distance_nmi": ("ping_time", dist_nmi)}).swap_dims(
            {"ping_time": "distance_nmi"}
        )
        range_edges = np.arange(
            0, np.nanmax(np.asarray(ds["depth"].values)) + range_bin, range_bin
        )
        dist_edges = np.arange(0, np.nanmax(dist_nmi) + dist_bin, dist_bin)
        dist_iv = ref_u._convert_bins_to_interval_index(dist_edges)
        range_iv = ref_u._convert_bins_to_interval_index(range_edges)
        raw = ref_u.compute_raw_NASC(ds_ref, range_iv, dist_iv)

        got = ep.commongrid.compute_NASC(ds, range_bin="4m", dist_bin="0.05nmi")

        want_nasc = np.asarray(raw["sv"].values, dtype="f8")
        got_nasc = np.asarray(got["NASC"].values, dtype="f8")
        assert got_nasc.shape == want_nasc.shape
        both = ~(np.isnan(want_nasc) | np.isnan(got_nasc))
        np.testing.assert_array_equal(np.isnan(got_nasc), np.isnan(want_nasc))
        np.testing.assert_allclose(
            got_nasc[both], want_nasc[both], rtol=3e-6, atol=1e-12
        )
        # mean ping_time per distance bin (reference: utils.py:160-168)
        want_pt = np.asarray(raw["ping_time"].values, dtype="datetime64[ns]")
        got_pt = np.asarray(got["ping_time"].values, dtype="datetime64[ns]")
        both_t = ~(np.isnat(want_pt) | np.isnat(got_pt))
        np.testing.assert_array_equal(np.isnat(got_pt), np.isnat(want_pt))
        dt_ns = np.abs(got_pt[both_t].astype("i8") - want_pt[both_t].astype("i8"))
        assert dt_ns.max() <= 2_000, f"mean ping_time off by {dt_ns.max()} ns"
        # distance / depth coords are bin left edges
        np.testing.assert_allclose(
            np.asarray(got.coords["distance"].values, dtype="f8"),
            np.array([v.left for v in raw["distance_nmi_bins"].values]),
        )
        np.testing.assert_allclose(
            np.asarray(got.coords["depth"].values, dtype="f8"),
            np.array([v.left for v in raw["depth_bins"].values]),
        )


class TestPositionReduction:
    def test_reduced_positions_match_reference(self):
        """MVBS lat/lon reduction vs reference _get_reduced_positions."""
        ds = make_nasc_ds(n_ping=30, seed=31)
        ref_u = load_ref("commongrid/utils")
        ping_edges = ping_interval_edges(
            np.asarray(ds.coords["ping_time"].values), "6s"
        )
        ping_iv = ref_u._convert_bins_to_interval_index(ping_edges)
        shell = Dataset(coords={"ping_time": ping_edges[:-1]})
        want = ref_u._get_reduced_positions(ds, shell, "MVBS", ping_iv)
        got = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="6s")
        for v in ("latitude", "longitude"):
            np.testing.assert_allclose(
                np.asarray(got[v].values, dtype="f8"),
                np.asarray(want[v].values, dtype="f8"),
                rtol=1e-12,
            )


class TestRawEntryPointEdgeSemantics:
    def test_right_closed_interval_index(self):
        """compute_raw_MVBS honors the IntervalIndex's own closed side."""
        ds = make_sv_ds(n_ch=2, n_ping=12, n_r=25, seed=43)
        er = np.asarray(ds["echo_range"].values)
        er[:] = np.broadcast_to(np.arange(25) * 1.0, er.shape)  # edge-landing
        ref_u = load_ref("commongrid/utils")
        edges_r = np.arange(0, 26.0, 5.0)
        edges_t = ping_interval_edges(np.asarray(ds.coords["ping_time"].values), "4s")
        ri = ref_u._convert_bins_to_interval_index(edges_r, closed="right")
        pi = ref_u._convert_bins_to_interval_index(edges_t, closed="right")
        want = ref_u.compute_raw_MVBS(ds, ri, pi)
        from echopype_tpu.commongrid.utils import compute_raw_MVBS

        got = compute_raw_MVBS(ds, ri, pi)
        np.testing.assert_allclose(
            np.asarray(got["Sv"].values, dtype="f8"),
            np.asarray(want["Sv"].values, dtype="f8"),
            atol=2e-5, rtol=0, equal_nan=True,
        )

    def test_fill_value_none_is_nan(self):
        ds = make_sv_ds(n_ch=2, n_ping=10, n_r=20, seed=45)
        pt = np.asarray(ds.coords["ping_time"].values).copy()
        pt[5:] += np.timedelta64(30, "s")  # leave empty time bins
        ds.coords["ping_time"].values = pt
        from echopype_tpu.commongrid.utils import compute_raw_MVBS
        from echopype_tpu.commongrid.utils import ping_time_bin_edges

        edges_t = ping_time_bin_edges(pt, "5s")
        out = compute_raw_MVBS(ds, np.arange(0, 15.0, 4.0), edges_t, fill_value=None)
        vals = np.asarray(out["Sv"].values)
        assert vals.dtype.kind == "f"
        assert np.isnan(vals).any()


class TestApiLevelMVBSDifferential:
    """The reference's FULL compute_MVBS api (resample bin grid, raw reduce,
    position reduction, cell_methods attrs) executed as the oracle
    (reference: commongrid/api.py:31-191)."""

    def test_full_api_matches(self):
        ds = make_nasc_ds(n_ping=26, seed=61)
        ref_api = load_ref("commongrid/api")
        want = ref_api.compute_MVBS(ds, range_bin="5m", ping_time_bin="6s")
        got = ep.commongrid.compute_MVBS(ds, range_bin="5m", ping_time_bin="6s")
        np.testing.assert_allclose(
            np.asarray(got["Sv"].values, dtype="f8"),
            np.asarray(want["Sv"].values, dtype="f8"),
            atol=2e-5, rtol=0, equal_nan=True,
        )
        np.testing.assert_array_equal(
            np.asarray(got.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(
                want.coords["ping_time"].values.tolist(), dtype="datetime64[ns]"
            ),
        )
        for v in ("latitude", "longitude"):
            np.testing.assert_allclose(
                np.asarray(got[v].values, dtype="f8"),
                np.asarray(want[v].values, dtype="f8"),
                rtol=1e-12,
            )
        # attrs parity: cell_methods / binning metadata
        for k in ("cell_methods", "binning_mode", "range_meter_interval",
                  "ping_time_interval"):
            assert got["Sv"].attrs.get(k) == want["Sv"].attrs.get(k), k


class TestRegridMaskDifferential:
    def test_regrid_mask_matches(self):
        """Reference regrid_mask (flox 'mean' over bins + AND/OR threshold)
        vs ours (reference: mask/api.py regrid_mask)."""
        rng = np.random.default_rng(71)
        n_ping, n_r = 30, 40
        pt = np.datetime64("2022-01-01T00:00:00", "ns") + np.arange(n_ping).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        from echopype_tpu.xrlite import DataArray

        mask = DataArray(
            (rng.uniform(size=(n_ping, n_r)) > 0.4),
            ("ping_time", "depth"),
            coords={"ping_time": pt, "depth": np.arange(n_r) * 1.0},
            name="mask",
        )
        range_da = DataArray(
            np.broadcast_to(np.arange(n_r) * 1.0, (n_ping, n_r)).copy(),
            ("ping_time", "depth"),
            coords={"ping_time": pt},
            name="depth",
        )
        ref_mask = load_ref("mask/api")
        for func in ("logical-AND", "logical-OR"):
            want = ref_mask.regrid_mask(
                mask, range_da, range_bin="5m", ping_time_bin="5s", func=func
            )
            got = ep.mask.regrid_mask(
                mask, range_da, range_bin="5m", ping_time_bin="5s", func=func
            )
            w = np.asarray(want.values)
            g = np.asarray(got.values)
            if g.shape != w.shape:
                want_t = want.transpose(*got.dims)
                w = np.asarray(want_t.values)
            np.testing.assert_array_equal(g.astype("f8"), w.astype("f8"), err_msg=func)

    @pytest.mark.parametrize("closed", ["left", "right"])
    def test_regrid_mask_wobbled_holed_grid(self, closed):
        """Round-4 regrid-soak regression: a per-ping wobbled range grid with
        interior NaN holes.  The old in-kernel path binary-searched rows that
        interior NaNs made non-monotone (garbage membership) and resolved
        edges in f32; the rewrite digitizes each sample on host in f64 — the
        reference's flox semantics — so the compare is exact."""
        rng = np.random.default_rng(332873462)
        n_ping, n_r = 27, 53
        pt = np.datetime64("2022-01-01T00:00:00", "ns") + (
            np.arange(n_ping) * 2
        ).astype("timedelta64[s]").astype("timedelta64[ns]")
        from echopype_tpu.xrlite import DataArray

        depth = np.arange(n_r) * 1.8055816400015732 + 1.3
        mask = DataArray(
            rng.uniform(size=(n_ping, n_r)) > 0.5,
            ("ping_time", "depth"),
            coords={"ping_time": pt, "depth": depth},
            name="mask",
        )
        rng_np = np.broadcast_to(depth, (n_ping, n_r)).copy()
        rng_np = rng_np * (1.0 + 0.02 * rng.standard_normal((n_ping, 1)))
        rng_np[rng.random((n_ping, n_r)) < 0.08] = np.nan  # interior holes
        range_da = DataArray(
            rng_np, ("ping_time", "depth"), coords={"ping_time": pt}, name="depth"
        )
        ref_mask = load_ref("mask/api")
        for func in ("logical-AND", "logical-OR"):
            want = ref_mask.regrid_mask(
                mask, range_da, range_bin="5.77m", ping_time_bin="5s",
                func=func, closed=closed,
            )
            got = ep.mask.regrid_mask(
                mask, range_da, range_bin="5.77m", ping_time_bin="5s",
                func=func, closed=closed,
            )
            w = np.asarray(want.values)
            g = np.asarray(got.values)
            if g.shape != w.shape:
                w = np.asarray(want.transpose(*got.dims).values)
            np.testing.assert_array_equal(
                g.astype("f8"), w.astype("f8"), err_msg=f"{func}/{closed}"
            )


    def test_regrid_mask_3d_per_channel_range(self):
        """Round-5 advisor regression: third_dim='channel' with a PER-CHANNEL
        3-D range grid (echo_range [channel, ping_time, range_sample]).  The
        round-4 elementwise rewrite only handled 1-D/2-D range_da — 3-D raised
        IndexError at m3[c][valid], and a broadcast fix alone would have pooled
        bin counts across channels.  The reference broadcasts the by-variable
        per channel (flox), so membership and counts must stay per-channel."""
        rng = np.random.default_rng(90215)
        n_ch, n_ping, n_r = 3, 25, 41
        pt = np.datetime64("2022-01-01T00:00:00", "ns") + np.arange(n_ping).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        from echopype_tpu.xrlite import DataArray

        chans = np.array([f"ch{i}" for i in range(n_ch)], dtype=object)
        mask = DataArray(
            rng.uniform(size=(n_ch, n_ping, n_r)) > 0.5,
            ("channel", "ping_time", "depth"),
            coords={
                "channel": chans,
                "ping_time": pt,
                "depth": np.arange(n_r) * 1.0,
            },
            name="mask",
        )
        # per-channel sample spacing -> genuinely 3-D, channel-varying grid
        er = np.stack(
            [
                np.broadcast_to(np.arange(n_r) * (1.0 + 0.3 * c), (n_ping, n_r))
                for c in range(n_ch)
            ]
        ).astype("f8")
        er[rng.random(er.shape) < 0.05] = np.nan
        range_da = DataArray(
            er,
            ("channel", "ping_time", "depth"),
            coords={"channel": chans, "ping_time": pt},
            name="echo_range",
        )
        ref_mask = load_ref("mask/api")
        for func in ("logical-AND", "logical-OR"):
            want = ref_mask.regrid_mask(
                mask, range_da, range_bin="7m", ping_time_bin="5s",
                func=func, third_dim="channel",
            )
            got = ep.mask.regrid_mask(
                mask, range_da, range_bin="7m", ping_time_bin="5s",
                func=func, third_dim="channel",
            )
            w = np.asarray(want.values)
            g = np.asarray(got.values)
            if g.shape != w.shape:
                w = np.asarray(want.transpose(*got.dims).values)
            np.testing.assert_array_equal(g.astype("f8"), w.astype("f8"), err_msg=func)


    def test_regrid_mask_3d_channel_order_by_label(self):
        """Round-5 review regression: when range_da's channel COORD order
        differs from mask_da's, pairing must go by label, not position —
        xarray/flox align the by-variable on coords before broadcasting."""
        rng = np.random.default_rng(55128)
        n_ch, n_ping, n_r = 3, 20, 31
        pt = np.datetime64("2022-01-01T00:00:00", "ns") + np.arange(n_ping).astype(
            "timedelta64[s]"
        ).astype("timedelta64[ns]")
        from echopype_tpu.xrlite import DataArray

        chans = np.array([f"ch{i}" for i in range(n_ch)], dtype=object)
        mask = DataArray(
            rng.uniform(size=(n_ch, n_ping, n_r)) > 0.5,
            ("channel", "ping_time", "depth"),
            coords={"channel": chans, "ping_time": pt,
                    "depth": np.arange(n_r) * 1.0},
            name="mask",
        )
        er = np.stack(
            [np.broadcast_to(np.arange(n_r) * (1.0 + 0.4 * c), (n_ping, n_r))
             for c in range(n_ch)]
        ).astype("f8")
        aligned = DataArray(
            er, ("channel", "ping_time", "depth"),
            coords={"channel": chans, "ping_time": pt}, name="echo_range",
        )
        perm = [2, 0, 1]
        shuffled = DataArray(
            er[perm], ("channel", "ping_time", "depth"),
            coords={"channel": chans[perm], "ping_time": pt}, name="echo_range",
        )
        for func in ("logical-AND", "logical-OR"):
            want = ep.mask.regrid_mask(
                mask, aligned, range_bin="6m", ping_time_bin="4s",
                func=func, third_dim="channel",
            )
            got = ep.mask.regrid_mask(
                mask, shuffled, range_bin="6m", ping_time_bin="4s",
                func=func, third_dim="channel",
            )
            np.testing.assert_array_equal(
                np.asarray(got.values).astype("f8"),
                np.asarray(want.values).astype("f8"), err_msg=func,
            )
        # a channel missing from range_da must refuse descriptively
        import pytest as _pytest
        with _pytest.raises(ValueError, match="missing"):
            ep.mask.regrid_mask(
                mask,
                DataArray(
                    er[:2], ("channel", "ping_time", "depth"),
                    coords={"channel": np.array(["ch0", "chX"], dtype=object),
                            "ping_time": pt},
                    name="echo_range",
                ),
                range_bin="6m", ping_time_bin="4s",
                func="logical-AND", third_dim="channel",
            )


class TestMVBSVaryingGridExact:
    """Round-4 mvbs-soak regression: ping-varying (wobbled) echo_range with
    interior NaN holes takes the exact f64 host accumulation — the in-kernel
    prefix-gather reduction lost quiet bins to f32 prefix cancellation
    (1.8e-3 dB observed), and interior NaNs broke its row binary search."""

    def test_compute_mvbs_wobbled_holed_grid(self):
        ds = make_sv_ds(n_ch=2, n_ping=48, n_r=41, seed=13)
        rng = np.random.default_rng(13)
        er = np.asarray(ds["echo_range"].values, dtype="f8").copy()
        er = er * (1.0 + 0.01 * rng.standard_normal(er.shape[:2])[..., None])
        er[rng.random(er.shape) < 0.06] = np.nan
        ds["echo_range"] = (("channel", "ping_time", "range_sample"), er)
        sv = np.asarray(ds["Sv"].values)
        sv[rng.random(sv.shape) < 0.1] = np.nan
        raw = _mvbs_oracle(ds, 1.0, "9s", closed="right", skipna=True, fill_value=np.nan)
        want = np.asarray(raw["Sv"].values, dtype="f8")
        got = np.asarray(
            ep.commongrid.compute_MVBS(
                ds, range_bin="1.0m", ping_time_bin="9s", closed="right",
                skipna=True, fill_value=np.nan,
            )["Sv"].values,
            dtype="f8",
        )
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        m = ~np.isnan(want)
        # exact path: only the f32 quantization of the input Sv remains
        np.testing.assert_allclose(got[m], want[m], rtol=0, atol=1e-5)


class TestApiLevelNASCDifferential:
    """The reference's FULL compute_NASC api — lat/lon distance walk
    (geopy shimmed onto the same WGS-84 geodesic both sides use),
    swap_dims, raw reduce, position/ping_time assembly, ACDD attrs —
    executed as the oracle (reference: commongrid/api.py:270-416)."""

    def test_full_api_matches(self):
        ds = make_nasc_ds(n_ping=35, seed=81)
        ref_api = load_ref("commongrid/api")
        want = ref_api.compute_NASC(ds.copy(), range_bin="4m", dist_bin="0.05nmi")
        got = ep.commongrid.compute_NASC(ds.copy(), range_bin="4m", dist_bin="0.05nmi")
        w = np.asarray(want["NASC"].values, dtype="f8")
        g = np.asarray(got["NASC"].values, dtype="f8")
        assert g.shape == w.shape
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        np.testing.assert_allclose(g[m], w[m], rtol=3e-6, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(got.coords["distance"].values, dtype="f8"),
            np.asarray(want.coords["distance"].values, dtype="f8"),
        )
        for k in ("geospatial_lat_min", "geospatial_lat_max",
                  "geospatial_lon_min", "geospatial_lon_max",
                  "Conventions", "time_coverage_start", "time_coverage_end"):
            assert got.attrs.get(k) == want.attrs.get(k), k


class TestSkipnaFalseAllNaNBinFill:
    """Round-5 soak-campaign-7 regression: with skipna=False and a
    fill_value, a bin whose members are ALL NaN-valued Sv (at valid range
    coords) has zero non-NaN count but WAS aggregated — flox leaves it NaN;
    the fill applies only to bins with nothing aggregated at all.  Our
    combiner previously filled any counts==0 bin (-100 dB where the
    reference had NaN, for a whole-NaN ping row)."""

    def test_all_nan_ping_row_stays_nan(self):
        ds = make_sv_ds(n_ch=2, n_ping=8, n_r=30, seed=77)
        sv = np.asarray(ds["Sv"].values)
        sv[:, 2:4, :] = np.nan  # one whole 2-ping time bin NaN-valued
        want = _mvbs_oracle(ds, 5.0, "2s", closed="left", skipna=False,
                            fill_value=1e-10)
        got = ep.commongrid.compute_MVBS(
            ds, range_bin="5m", ping_time_bin="2s", closed="left",
            skipna=False, fill_value=1e-10,
        )
        w = np.asarray(want["Sv"].values, dtype="f8")
        g = np.asarray(got["Sv"].values, dtype="f8")
        assert np.isnan(w[:, 1, :]).all()  # oracle: aggregated-NaN, not filled
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        assert float(np.max(np.abs(g[m] - w[m]))) < 1e-5 if m.any() else True

    def test_truly_empty_bins_still_fill(self):
        ds = make_sv_ds(n_ch=1, n_ping=6, n_r=20, seed=78)
        # force a deep range bin with no samples: range_var_max beyond data
        got = ep.commongrid.compute_MVBS(
            ds, range_bin="5m", ping_time_bin="2s", skipna=False,
            fill_value=1e-10, range_var_max="60m",
        )
        g = np.asarray(got["Sv"].values, dtype="f8")
        assert np.isclose(g[..., -1], -100.0).all()  # 10*log10(1e-10)
