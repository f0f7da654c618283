"""Reference-differential parity for post-processing subpackages.

Round-3 extension of the facade harness: the reference's metrics, qc, mask,
and consolidate modules execute directly on our data structures; ours must
match.  (commongrid/clean stay on synthetic oracles — their cores live in
flox/dask-image, which are not importable here.)
"""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import DataArray, Dataset

from ref_oracle import FakeEchoData, load_ref
from synth_ek60 import write_ek60_raw


def make_sv_ds(n_ch=2, n_ping=12, n_r=40, seed=0):
    rng = np.random.default_rng(seed)
    ping_time = np.datetime64("2022-01-01T00:00:00", "ns") + np.arange(n_ping).astype(
        "timedelta64[s]"
    ).astype("timedelta64[ns]")
    sv = rng.normal(-70, 10, (n_ch, n_ping, n_r)).astype("f8")
    er = np.broadcast_to(np.arange(n_r) * 0.5, (n_ch, n_ping, n_r)).copy()
    return Dataset(
        {
            "Sv": (("channel", "ping_time", "range_sample"), sv),
            "echo_range": (("channel", "ping_time", "range_sample"), er),
            "frequency_nominal": (("channel",), 18000.0 * (1 + np.arange(n_ch))),
        },
        coords={
            "channel": np.array([f"ch{i}" for i in range(n_ch)], dtype=object),
            "ping_time": ping_time,
            "range_sample": np.arange(n_r),
        },
    )


class TestMetricsDifferential:
    @pytest.mark.parametrize(
        "fname", ["abundance", "center_of_mass", "dispersion", "evenness", "aggregation"]
    )
    def test_metric_matches_reference(self, fname):
        ds = make_sv_ds()
        ref_m = load_ref("metrics/summary_statistics")
        want = getattr(ref_m, fname)(ds)
        got = getattr(ep.metrics, fname)(ds)
        wv = np.asarray(getattr(want, "values", want), dtype="f8")
        gv = np.asarray(getattr(got, "values", got), dtype="f8")
        np.testing.assert_allclose(gv.squeeze(), wv.squeeze(), rtol=1e-12, atol=0)


class TestQCDifferential:
    def _reversed_ds(self):
        ds = make_sv_ds(n_ping=30)
        pt = np.asarray(ds.coords["ping_time"].values).copy()
        pt[7] = pt[5] - np.timedelta64(2, "s")
        pt[19] = pt[17] - np.timedelta64(5, "s")
        ds.coords["ping_time"].values = pt
        return ds

    def test_exist_reversed_time(self):
        ref_qc = load_ref("qc/api")
        ds = self._reversed_ds()
        assert bool(ref_qc.exist_reversed_time(ds, "ping_time")) == bool(
            ep.qc.exist_reversed_time(ds, "ping_time")
        )
        clean = make_sv_ds()
        assert bool(ref_qc.exist_reversed_time(clean, "ping_time")) == bool(
            ep.qc.exist_reversed_time(clean, "ping_time")
        )

    def test_coerce_increasing_time_matches(self):
        ref_qc = load_ref("qc/api")
        ds_ref = self._reversed_ds()
        ds_ours = self._reversed_ds()
        ref_qc.coerce_increasing_time(ds_ref, time_name="ping_time", win_len=10)
        ours = ep.qc.coerce_increasing_time(ds_ours, time_name="ping_time", win_len=10)
        ref_pt = np.asarray(ds_ref.coords["ping_time"].values).astype("i8")
        our_pt = np.asarray(ours.coords["ping_time"].values).astype("i8")
        np.testing.assert_array_equal(ref_pt, our_pt)


class TestMaskDifferential:
    def test_frequency_differencing_matches(self):
        ds = make_sv_ds()
        ref_mask = load_ref("mask/api")
        for eq in ('"ch0" - "ch1" > 3.0dB', '"ch1" - "ch0" <= 1.5dB'):
            want = ref_mask.frequency_differencing(ds, chanABEq=eq)
            got = ep.mask.frequency_differencing(ds, chanABEq=eq)
            np.testing.assert_array_equal(
                np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
            )

    def test_frequency_differencing_freq_eq(self):
        ds = make_sv_ds()
        ref_mask = load_ref("mask/api")
        eq = "36kHz - 18kHz > 2.0dB"
        want = ref_mask.frequency_differencing(ds, freqABEq=eq)
        got = ep.mask.frequency_differencing(ds, freqABEq=eq)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )

    def test_apply_mask_matches(self):
        ds = make_sv_ds()
        rng = np.random.default_rng(3)
        m1 = DataArray(
            rng.random((12, 40)) > 0.4,
            ("ping_time", "range_sample"),
            coords={
                "ping_time": ds.coords["ping_time"],
                "range_sample": ds.coords["range_sample"],
            },
        )
        m2 = DataArray(
            rng.random((12, 40)) > 0.2,
            ("ping_time", "range_sample"),
            coords={
                "ping_time": ds.coords["ping_time"],
                "range_sample": ds.coords["range_sample"],
            },
        )
        ref_mask = load_ref("mask/api")
        for masks in (m1, [m1, m2]):
            want = ref_mask.apply_mask(ds, masks, var_name="Sv")
            got = ep.mask.apply_mask(ds, masks, var_name="Sv")
            wv = np.asarray(want["Sv"].values, dtype="f8")
            gv = np.asarray(got["Sv"].values, dtype="f8")
            assert np.array_equal(np.isnan(wv), np.isnan(gv))
            np.testing.assert_allclose(gv, wv, rtol=0, atol=0, equal_nan=True)

    def test_apply_mask_fill_value(self):
        ds = make_sv_ds()
        rng = np.random.default_rng(4)
        m = DataArray(
            rng.random((12, 40)) > 0.5,
            ("ping_time", "range_sample"),
            coords={
                "ping_time": ds.coords["ping_time"],
                "range_sample": ds.coords["range_sample"],
            },
        )
        ref_mask = load_ref("mask/api")
        want = ref_mask.apply_mask(ds, m, var_name="Sv", fill_value=-999.0)
        got = ep.mask.apply_mask(ds, m, var_name="Sv", fill_value=-999.0)
        np.testing.assert_allclose(
            np.asarray(got["Sv"].values), np.asarray(want["Sv"].values),
            rtol=0, atol=0, equal_nan=True,
        )


@pytest.fixture(scope="module")
def ek60_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refpp_ek60")
    path = tmp / "PP-D20200101-T000000.raw"
    write_ek60_raw(path, n_pings=10, n_samples=60)
    ed = ep.open_raw(path, sonar_model="EK60")
    groups = {}
    for g in (
        "Sonar", "Environment", "Vendor_specific", "Platform", "Platform/NMEA",
        "Sonar/Beam_group1",
    ):
        try:
            groups[g] = ed[g]
        except KeyError:
            pass
    return ed, FakeEchoData(groups, "EK60")


class TestConsolidateDifferential:
    def test_add_depth_basic(self, ek60_pair):
        ed, fake = ek60_pair
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_depth(ds.copy(), depth_offset=5.0, tilt=15.0, downward=True)
        got = ep.consolidate.add_depth(ds.copy(), depth_offset=5.0, tilt=15.0, downward=True)
        np.testing.assert_allclose(
            np.asarray(got["depth"].values, dtype="f8"),
            np.asarray(want["depth"].values, dtype="f8"),
            rtol=1e-12, atol=0, equal_nan=True,
        )

    def test_add_depth_upward(self, ek60_pair):
        ed, fake = ek60_pair
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_depth(ds.copy(), depth_offset=2.0, downward=False)
        got = ep.consolidate.add_depth(ds.copy(), depth_offset=2.0, downward=False)
        np.testing.assert_allclose(
            np.asarray(got["depth"].values, dtype="f8"),
            np.asarray(want["depth"].values, dtype="f8"),
            rtol=1e-12, atol=0, equal_nan=True,
        )

    @pytest.mark.parametrize(
        "flag",
        ["use_platform_vertical_offsets", "use_platform_angles", "use_beam_angles"],
    )
    def test_add_depth_group_branches(self, ek60_pair, flag):
        """The three ek_depth_utils branches (reference
        consolidate/ek_depth_utils.py:30-117) executed as oracles on our
        converted groups: transducer depth from Platform vertical offsets,
        echo-range scaling from pitch/roll ZYX rotation, and from
        beam_direction_z normalization."""
        ed, fake = ek60_pair
        if flag == "use_beam_angles":
            # synth EK60 carries NaN beam directions; fill a non-trivial
            # (unnormalized + one zero) set so the branch is exercised
            beam = ed["Sonar/Beam_group1"]
            n_ch = len(np.atleast_1d(beam.coords["channel"].values))
            bx = np.linspace(0.0, 0.3, n_ch)
            by = np.linspace(0.1, 0.0, n_ch)
            bz = np.full(n_ch, 2.0)
            bz[-1] = 0.0 if n_ch > 1 else 2.0
            bx[-1] = by[-1] = 0.0
            for nm, v in (("beam_direction_x", bx), ("beam_direction_y", by),
                          ("beam_direction_z", bz)):
                beam[nm] = (("channel",), v)
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_depth(ds.copy(), echodata=fake, **{flag: True})
        got = ep.consolidate.add_depth(ds.copy(), echodata=ed, **{flag: True})
        wv = np.asarray(want["depth"].values, dtype="f8")
        gv = np.asarray(got["depth"].values, dtype="f8")
        if flag == "use_beam_angles":
            assert np.isfinite(wv).any()  # not a vacuous all-NaN comparison
        np.testing.assert_allclose(gv, wv, rtol=1e-12, atol=0, equal_nan=True)

    def test_add_location_matches(self, ek60_pair):
        ed, fake = ek60_pair
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_location(ds.copy(), fake)
        got = ep.consolidate.add_location(ds.copy(), ed)
        for var in ("latitude", "longitude"):
            np.testing.assert_allclose(
                np.asarray(got[var].values, dtype="f8"),
                np.asarray(want[var].values, dtype="f8"),
                rtol=1e-12, atol=1e-12, equal_nan=True,
            )

    def test_add_splitbeam_angle_power(self, ek60_pair):
        ed, fake = ek60_pair
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_splitbeam_angle(
            ds.copy(), fake, waveform_mode="CW", encode_mode="power", to_disk=False
        )
        got = ep.consolidate.add_splitbeam_angle(
            ds.copy(), ed, waveform_mode="CW", encode_mode="power", to_disk=False
        )
        for var in ("angle_alongship", "angle_athwartship"):
            np.testing.assert_allclose(
                np.asarray(got[var].values, dtype="f8"),
                np.asarray(want[var].values, dtype="f8"),
                rtol=1e-10, atol=1e-12, equal_nan=True,
            )


class TestSplitbeamComplexDifferential:
    """CW-complex split-beam angles vs the reference's complex-sample path
    (reference: consolidate/split_beam_angle.py:33-116,176-)."""

    def test_add_splitbeam_angle_cw_complex(self, tmp_path):
        from synth_ek80 import write_ek80_raw
        from test_ref_pipeline import _fake

        path = tmp_path / "SBC-D20210201-T000000.raw"
        write_ek80_raw(path, n_pings=6, n_samples=64)
        ed = ep.open_raw(path, sonar_model="EK80")
        ds = ep.calibrate.compute_Sv(ed, waveform_mode="CW", encode_mode="complex")
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_splitbeam_angle(
            ds.copy(), _fake(ed), waveform_mode="CW", encode_mode="complex",
            to_disk=False,
        )
        got = ep.consolidate.add_splitbeam_angle(
            ds.copy(), ed, waveform_mode="CW", encode_mode="complex",
            to_disk=False,
        )
        for var in ("angle_alongship", "angle_athwartship"):
            w = np.asarray(want[var].values, dtype="f8")
            g = np.asarray(got[var].values, dtype="f8")
            np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
            m = ~np.isnan(w)
            np.testing.assert_allclose(g[m], w[m], rtol=1e-9, atol=1e-10)


class TestSplitbeamBBDifferential:
    """BB pulse-compressed split-beam angles vs the reference
    (reference: consolidate/api.py:507-520, split_beam_angle.py:176-)."""

    @pytest.mark.parametrize("pulse_compression", [False, True])
    def test_add_splitbeam_angle_bb(self, tmp_path, pulse_compression):
        from synth_ek80 import write_ek80_raw
        from test_ref_pipeline import _fake

        path = tmp_path / f"SBB{int(pulse_compression)}-D20210201-T000000.raw"
        write_ek80_raw(
            path, n_pings=5, n_samples=64,
            with_power_channel=False, with_cw_complex=False,
        )
        ed = ep.open_raw(path, sonar_model="EK80")
        ds = ep.calibrate.compute_Sv(ed, waveform_mode="BB", encode_mode="complex")
        ref_c = load_ref("consolidate/api")
        kw = dict(waveform_mode="BB", encode_mode="complex",
                  pulse_compression=pulse_compression, to_disk=False)
        want = ref_c.add_splitbeam_angle(ds.copy(), _fake(ed), **kw)
        got = ep.consolidate.add_splitbeam_angle(ds.copy(), ed, **kw)
        for var in ("angle_alongship", "angle_athwartship"):
            w_da = want[var]
            g_da = got[var]
            if w_da.dims != g_da.dims:
                w_da = w_da.transpose(*g_da.dims)
            w = np.asarray(w_da.values, dtype="f8")
            g = np.asarray(g_da.values, dtype="f8")
            np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
            m = ~np.isnan(w)
            # PC residual <= ~1e-5 deg: the reference's compress_pulse
            # quantizes to complex64 (ek80_complex.py:304); ours stays f64
            # (see the error-budget table's BB row)
            tol = 2e-5 if pulse_compression else 1e-9
            np.testing.assert_allclose(g[m], w[m], rtol=0, atol=tol)


class TestAddLocationIDXDifferential:
    """add_location(datagram_type='IDX'): IDX-derived Platform lat/lon
    (round-4 sidecar support) interpolates onto ping_time identically to
    the reference (consolidate/api.py:244-342 + loc_utils)."""

    def test_idx_location_matches(self, tmp_path):
        from synth_ek60 import write_ek60_raw
        from test_sidecars import write_sidecars

        raw = tmp_path / "LI0001-D20200101-T000000-EK60.raw"
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        write_ek60_raw(raw, n_pings=6, n_samples=24, t0=t0)
        write_sidecars(raw, t0, n=6, n_chan=2)
        ed = ep.open_raw(str(raw), sonar_model="EK60",
                         include_bot=True, include_idx=True)
        fake = FakeEchoData({g: ed[g] for g in ed.group_paths}, "EK60")
        ds = ep.calibrate.compute_Sv(ed)
        ref_c = load_ref("consolidate/api")
        want = ref_c.add_location(ds.copy(), fake, datagram_type="IDX")
        got = ep.consolidate.add_location(ds.copy(), ed, datagram_type="IDX")
        for var in ("latitude", "longitude"):
            np.testing.assert_allclose(
                np.asarray(got[var].values, dtype="f8"),
                np.asarray(want[var].values, dtype="f8"),
                rtol=1e-12, atol=1e-12, equal_nan=True,
            )
        # IDX-derived positions differ from the NMEA-derived default
        base = ep.consolidate.add_location(ds.copy(), ed)
        assert not np.allclose(
            np.asarray(got["latitude"].values), np.asarray(base["latitude"].values)
        )


class TestMultiSectorDifferential:
    """3-sector (beam_type 17) and 3+center (65/81) transducers through the
    reference's CW-complex calibration AND split-beam angle paths
    (reference: calibrate/calibrate_ek.py:456-505 prx sector mean;
    consolidate/split_beam_angle.py:82-103 sector combinations)."""

    @pytest.mark.parametrize("beam_type", [17, 65, 81])
    def test_sv_and_splitbeam_match_reference(self, tmp_path, beam_type):
        from synth_ek80 import write_ek80_multisector
        from test_ref_pipeline import _fake, _sv_delta

        path = tmp_path / f"MS{beam_type}-D20210201-T000000.raw"
        write_ek80_multisector(path, beam_type=beam_type, n_pings=4, seed=beam_type)
        ed = ep.open_raw(path, sonar_model="EK80")
        assert ed["Sonar/Beam_group1"].sizes["beam"] == (3 if beam_type == 17 else 4)

        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None,
            waveform_mode="CW", encode_mode="complex",
        )
        ref_sv = ref_cal.compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="CW", encode_mode="complex", precision="float64"
        )
        assert _sv_delta(ref_sv, our_sv) < 1e-9

        ref_c = load_ref("consolidate/api")
        kw = dict(waveform_mode="CW", encode_mode="complex", to_disk=False)
        want = ref_c.add_splitbeam_angle(our_sv.copy(), _fake(ed), **kw)
        got = ep.consolidate.add_splitbeam_angle(our_sv.copy(), ed, **kw)
        for var in ("angle_alongship", "angle_athwartship"):
            w = np.asarray(want[var].values, dtype="f8")
            g = np.asarray(got[var].values, dtype="f8")
            np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
            m = ~np.isnan(w)
            np.testing.assert_allclose(g[m], w[m], rtol=1e-9, atol=1e-10)
