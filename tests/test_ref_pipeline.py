"""Pipeline-level differential parity: reference calibrate code as the oracle.

The xrlite xarray facade (echopype_tpu/xrlite/xarray_compat.py) lets the
reference's xarray-dependent compute modules execute directly on our
converted groups.  Each test runs the REFERENCE implementation
(calibrate/range.py, cal_params.py, env_params.py, calibrate_ek.py) on the
same synthetic EchoData our pipeline consumes and asserts our outputs match.

This converts the compute core's verification from "agrees with a
builder-written oracle" to "agrees with reference-executed code"
(VERDICT r2, item 1).
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import FakeEchoData, load_ref
from synth_ek60 import write_ek60_raw
from synth_ek80 import CH_BB, write_ek80_raw


# --------------------------------------------------------------------------
# fixtures: synthetic files converted by OUR pipeline, wrapped for the
# reference calibrators
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ek60_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refpipe_ek60")
    path = tmp / "REF-D20200101-T000000.raw"
    truth = write_ek60_raw(path, n_pings=10, n_samples=80)
    ed = ep.open_raw(path, sonar_model="EK60")
    return ed, truth


@pytest.fixture(scope="module")
def ek80_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refpipe_ek80")
    path = tmp / "REF80-D20210201-T000000.raw"
    truth = write_ek80_raw(path, n_pings=6, n_samples=64)
    ed = ep.open_raw(path, sonar_model="EK80")
    return ed, truth


def _fake(ed):
    groups = {}
    for p in (
        "Sonar",
        "Environment",
        "Vendor_specific",
        "Sonar/Beam_group1",
        "Sonar/Beam_group2",
        "Sonar/Beam_group3",
    ):
        try:
            groups[p] = ed[p]
        except KeyError:
            pass
    return FakeEchoData(groups, ed.sonar_model)


def _sv_delta(ref_ds, our_ds, var="Sv"):
    """Max |Δ| between reference-executed and our calibrated output."""
    ref = ref_ds[var]
    if "beam" in ref.dims:
        ref = ref.isel(beam=0)
    ref = ref.transpose("channel", "ping_time", "range_sample")
    ours = our_ds[var].transpose("channel", "ping_time", "range_sample")
    assert list(np.asarray(ref["channel"].values)) == list(
        np.asarray(our_ds["channel"].values)
    )
    rv, ov = np.asarray(ref.values, dtype="f8"), np.asarray(ours.values, dtype="f8")
    assert rv.shape == ov.shape
    assert np.array_equal(np.isnan(rv), np.isnan(ov)), "NaN masks differ"
    d = np.abs(rv - ov)
    return np.nanmax(d) if np.isfinite(d).any() else 0.0


# --------------------------------------------------------------------------
# EK60: full reference CalibrateEK60 pipeline vs ours
# --------------------------------------------------------------------------


class TestEK60FullPipeline:
    def test_compute_sv_matches_reference(self, ek60_ed):
        ed, _ = ek60_ed
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK60(_fake(ed), None, None, None)
        ref_sv = ref_cal.compute_Sv()
        # the f64 opt-in is exact parity; the f32 DEFAULT (device kernels)
        # stays inside its published budget (docs/PERFORMANCE.md)
        our_sv = ep.calibrate.compute_Sv(ed, precision="float64")
        delta = _sv_delta(ref_sv, our_sv)
        assert delta < 1e-9, f"EK60 Sv differs from reference by {delta} dB"
        d32 = _sv_delta(ref_sv, ep.calibrate.compute_Sv(ed))
        assert d32 < 1e-4, f"EK60 Sv f32-default differs by {d32} dB"

    def test_compute_ts_matches_reference(self, ek60_ed):
        ed, _ = ek60_ed
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK60(_fake(ed), None, None, None)
        ref_ts = ref_cal.compute_TS()
        our_ts = ep.calibrate.compute_TS(ed, precision="float64")
        delta = _sv_delta(ref_ts, our_ts, var="TS")
        assert delta < 1e-9, f"EK60 TS differs from reference by {delta} dB"

    def test_echo_range_matches_reference(self, ek60_ed):
        ed, _ = ek60_ed
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK60(_fake(ed), None, None, None)
        ref_sv = ref_cal.compute_Sv()
        our_sv = ep.calibrate.compute_Sv(ed)
        delta = _sv_delta(ref_sv, our_sv, var="echo_range")
        assert delta < 1e-3, f"echo_range differs by {delta} m"

    def test_cal_params_match_reference(self, ek60_ed):
        """Reference get_cal_params_EK vs our resolver on the same groups."""
        ed, _ = ek60_ed
        ref_cp = load_ref("calibrate/cal_params")
        from echopype_tpu.calibrate.cal_params import get_cal_params_EK as our_gcp

        beam = ed["Sonar/Beam_group1"]
        vend = ed["Vendor_specific"]
        ref = ref_cp.get_cal_params_EK(
            waveform_mode="CW",
            freq_center=beam["frequency_nominal"],
            beam=beam,
            vend=vend,
            user_dict={},
            sonar_type="EK60",
        )
        ours = our_gcp(
            waveform_mode="CW",
            freq_center=beam["frequency_nominal"],
            beam=beam,
            vend=vend,
            user_dict={},
            sonar_type="EK60",
        )
        assert set(k for k, v in ref.items() if v is not None) == set(
            k for k, v in ours.items() if v is not None
        )
        for k, rv in ref.items():
            if rv is None:
                continue
            ov = ours[k]
            rvv = np.asarray(rv.values, dtype="f8")
            ovv = np.asarray(ov, dtype="f8") if not hasattr(ov, "values") else np.asarray(
                ov.values, dtype="f8"
            )
            if rvv.shape != ovv.shape and rvv.size == ovv.size:
                ovv = ovv.reshape(rvv.shape)
            np.testing.assert_allclose(rvv, ovv, rtol=0, atol=1e-12, err_msg=k)

    def test_env_params_match_reference(self, ek60_ed):
        ed, _ = ek60_ed
        ref_ep = load_ref("calibrate/env_params")
        from echopype_tpu.calibrate.env_params import get_env_params_EK as our_gep

        beam = ed["Sonar/Beam_group1"]
        env = ed["Environment"]
        for user in ({}, {"temperature": 10.0, "salinity": 32.0, "pressure": 100.0, "pH": 8.1}):
            ref = ref_ep.get_env_params_EK(
                sonar_type="EK60", beam=beam, env=env, user_dict=dict(user)
            )
            ours = our_gep(sonar_type="EK60", beam=beam, env=env, user_dict=dict(user))
            for k, rv in ref.items():
                assert k in ours, f"{k} missing from our env params (user={user})"
                ov = ours[k]
                if isinstance(rv, str):
                    assert rv == ov
                    continue
                rvv = np.asarray(getattr(rv, "values", rv), dtype="f8")
                ovv = np.asarray(getattr(ov, "values", ov), dtype="f8")
                np.testing.assert_allclose(
                    rvv.squeeze(), ovv.squeeze(), rtol=0, atol=1e-12, err_msg=k
                )


# --------------------------------------------------------------------------
# EK80: reference CalibrateEK80 (CW complex + BB) vs ours
# --------------------------------------------------------------------------


class TestEK80FullPipeline:
    def _ref_cal(self, ed, waveform_mode, encode_mode):
        ref_ek = load_ref("calibrate/calibrate_ek")
        return ref_ek.CalibrateEK80(
            _fake(ed),
            env_params=None,
            cal_params=None,
            waveform_mode=waveform_mode,
            encode_mode=encode_mode,
        )

    def test_power_mode_sv(self, ek80_ed):
        ed, _ = ek80_ed
        ref_sv = self._ref_cal(ed, "CW", "power").compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="CW", encode_mode="power", precision="float64"
        )
        delta = _sv_delta(ref_sv, our_sv)
        assert delta < 1e-9, f"EK80 CW-power Sv differs by {delta} dB"
        d32 = _sv_delta(
            ref_sv, ep.calibrate.compute_Sv(ed, waveform_mode="CW", encode_mode="power")
        )
        assert d32 < 1e-4, f"EK80 CW-power f32-default differs by {d32} dB"

    def test_cw_complex_sv(self, ek80_ed):
        ed, _ = ek80_ed
        ref_sv = self._ref_cal(ed, "CW", "complex").compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="CW", encode_mode="complex", precision="float64"
        )
        delta = _sv_delta(ref_sv, our_sv)
        assert delta < 1e-9, f"EK80 CW-complex Sv differs by {delta} dB"

    def test_bb_sv(self, ek80_ed):
        ed, _ = ek80_ed
        ref_sv = self._ref_cal(ed, "BB", "complex").compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="BB", encode_mode="complex", precision="float64"
        )
        delta = _sv_delta(ref_sv, our_sv)
        # residual floor: the reference quantizes its pulse-compression output
        # to complex64 (_convolve_per_channel allocates np.complex64,
        # ek80_complex.py:304) while ours stays float64 throughout; the
        # difference is the reference's own rounding, well under the 1e-5 dB
        # contract
        assert delta < 5e-6, f"EK80 BB Sv differs by {delta} dB"

    def test_cw_complex_ts(self, ek80_ed):
        """EK80 CW-complex TS vs the reference calibrator (round 4: TS was
        builder-tested only)."""
        ed, _ = ek80_ed
        ref_ts = self._ref_cal(ed, "CW", "complex").compute_TS()
        our_ts = ep.calibrate.compute_TS(
            ed, waveform_mode="CW", encode_mode="complex", precision="float64"
        )
        delta = _sv_delta(ref_ts, our_ts, var="TS")
        assert delta < 1e-9, f"EK80 CW-complex TS differs by {delta} dB"

    def test_bb_ts(self, ek80_ed):
        """EK80 BB TS vs the reference calibrator."""
        ed, _ = ek80_ed
        ref_ts = self._ref_cal(ed, "BB", "complex").compute_TS()
        our_ts = ep.calibrate.compute_TS(
            ed, waveform_mode="BB", encode_mode="complex", precision="float64"
        )
        delta = _sv_delta(ref_ts, our_ts, var="TS")
        # same residual floor as BB Sv: the reference's own complex64 pc
        # quantization
        assert delta < 5e-6, f"EK80 BB TS differs by {delta} dB"

    def test_f32_device_path_budget(self, ek80_ed):
        """The f32 device path must stay inside the documented error budget.

        NaN masks may differ at samples whose reference value is an exact
        structural zero (Hann-taper endpoint), so compare finite cells only.
        """
        ed, _ = ek80_ed
        ref_sv = self._ref_cal(ed, "BB", "complex").compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="BB", encode_mode="complex", precision="float32"
        )
        ref = ref_sv["Sv"].transpose("channel", "ping_time", "range_sample")
        ours = our_sv["Sv"].transpose("channel", "ping_time", "range_sample")
        rv = np.asarray(ref.values, dtype="f8")
        ov = np.asarray(ours.values, dtype="f8")
        both = np.isfinite(rv) & np.isfinite(ov)
        assert both.any()
        # mask disagreements only at the structural-zero tail
        mismatch = np.isnan(rv) != np.isnan(ov)
        assert mismatch.mean() < 0.05
        delta = np.abs(rv[both] - ov[both]).max()
        assert delta < 2e-4, f"f32 BB path exceeds budget: {delta} dB"

    def test_bb_cal_params_interp_chain(self, ek80_ed):
        """BB interpolation fallback chain (cal_params.py:165-258) differential."""
        ed, _ = ek80_ed
        ref_cp = load_ref("calibrate/cal_params")
        from echopype_tpu.calibrate.cal_params import get_cal_params_EK as our_gcp

        # reproduce the calibrator's channel subset for BB mode
        ref_ek = load_ref("calibrate/calibrate_ek")
        cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None,
            waveform_mode="BB", encode_mode="complex",
        )
        beam, vend, freq_center = cal.beam, cal.vend, cal.freq_center
        ref = ref_cp.get_cal_params_EK(
            waveform_mode="BB", freq_center=freq_center,
            beam=beam, vend=vend, user_dict={}, sonar_type="EK80",
        )
        ours = our_gcp(
            waveform_mode="BB", freq_center=freq_center,
            beam=beam, vend=vend, user_dict={}, sonar_type="EK80",
        )
        for k, rv in ref.items():
            if rv is None:
                continue
            assert ours.get(k) is not None, f"{k} missing from ours"
            rvv = np.asarray(getattr(rv, "values", rv), dtype="f8")
            ovv = np.asarray(getattr(ours[k], "values", ours[k]), dtype="f8")
            np.testing.assert_allclose(
                np.broadcast_arrays(rvv.squeeze(), ovv.squeeze())[0],
                np.broadcast_arrays(rvv.squeeze(), ovv.squeeze())[1],
                rtol=0, atol=1e-10, err_msg=k,
            )


class TestAZFPPipelineDifferential:
    """Reference CalibrateAZFP executed on our converted groups
    (reference: calibrate/calibrate_azfp.py:10-125)."""

    @pytest.fixture(scope="class")
    def azfp_ed(self, tmp_path_factory):
        from synth_azfp import write_azfp_raw, write_azfp_xml

        tmp = tmp_path_factory.mktemp("refpipe_azfp")
        raw = tmp / "23010100.01A"
        xml = tmp / "cfg.xml"
        write_azfp_raw(raw, n_pings=8)
        write_azfp_xml(xml)
        return ep.open_raw(raw, sonar_model="AZFP", xml_path=str(xml))

    @pytest.mark.parametrize("cal_type", ["Sv", "TS"])
    def test_azfp_cal_matches_reference(self, azfp_ed, cal_type):
        ed = azfp_ed
        ref_mod = load_ref("calibrate/calibrate_azfp")
        fake = FakeEchoData(
            {
                p: ed[p]
                for p in ("Sonar/Beam_group1", "Environment", "Vendor_specific")
            },
            ed.sonar_model,
        )
        env = {"salinity": 30.0, "pressure": 10.0, "temperature": 8.0}
        cal = ref_mod.CalibrateAZFP(fake, env_params=dict(env))
        want = cal.compute_Sv() if cal_type == "Sv" else cal.compute_TS()
        got = (
            ep.calibrate.compute_Sv(ed, env_params=dict(env))
            if cal_type == "Sv"
            else ep.calibrate.compute_TS(ed, env_params=dict(env))
        )
        w = np.asarray(want[cal_type].values, dtype="f8")
        g = np.asarray(got[cal_type].values, dtype="f8")
        if w.shape != g.shape:
            want_t = want[cal_type].transpose(*got[cal_type].dims)
            w = np.asarray(want_t.values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        np.testing.assert_allclose(g[m], w[m], rtol=0, atol=1e-10)
        # echo_range must match too (AZFP Sv/TS use different range formulas)
        we_da = want["echo_range"]
        ge_da = got["echo_range"]
        we = np.asarray(we_da.values, dtype="f8")
        # align reference dims into our dim order, inserting singleton axes
        # for dims the reference lacks (its AZFP echo_range has no ping_time)
        order = [d for d in ge_da.dims if d in we_da.dims]
        we = np.transpose(we, [we_da.dims.index(d) for d in order])
        for i, d in enumerate(ge_da.dims):
            if d not in we_da.dims:
                we = np.expand_dims(we, i)
        ge = np.asarray(ge_da.values, dtype="f8")
        np.testing.assert_allclose(
            ge, np.broadcast_to(we, ge.shape), rtol=0, atol=1e-10, equal_nan=True
        )


class TestECSIntegrationDifferential:
    """compute_Sv with an ECS file vs the reference CalibrateEK60(ecs_file=):
    the full ECS precedence chain (fileset < sourcecal < localcal), env
    override, and sonar-equation assembly in one differential
    (reference: calibrate/calibrate_base.py:13-43, ecs.py)."""

    def test_ek60_ecs_calibration_matches(self, tmp_path):
        from test_ecs import ECS_CONTENT

        ecs = tmp_path / "cal.ecs"
        ecs.write_text(ECS_CONTENT)
        raw = tmp_path / "ECSD-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=8, n_samples=50)
        ed = ep.open_raw(str(raw), sonar_model="EK60")

        ref_ek = load_ref("calibrate/calibrate_ek")
        want = (
            ref_ek.CalibrateEK60(_fake(ed), None, None, str(ecs))
            .compute_Sv()["Sv"]
            .transpose("channel", "ping_time", "range_sample")
        )
        got = ep.calibrate.compute_Sv(ed, ecs_file=str(ecs), precision="float64")["Sv"]
        w = np.asarray(want.values, dtype="f8")
        g = np.asarray(got.values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        np.testing.assert_allclose(g[m], w[m], rtol=0, atol=1e-12)

    def test_ek80_ecs_params_match(self, tmp_path):
        """EK80 ECS: reference-assimilated env + narrowband cal params vs
        ours.  (The Sv-level BB comparison is out of reach here: the
        reference's ECS gain-table interpolation returns NaN under the
        facade's partial interp; the BB interp chain itself is differentially
        covered by test_bb_cal_params_interp_chain.)"""
        from test_ecs import ECS_EK80_BB_CONTENT

        ecs = tmp_path / "bb.ecs"
        ecs.write_text(ECS_EK80_BB_CONTENT)
        raw = tmp_path / "ECS80-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=5, n_samples=64,
                       with_power_channel=False, with_cw_complex=False)
        ed = ep.open_raw(str(raw), sonar_model="EK80")

        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None, ecs_file=str(ecs),
            waveform_mode="BB", encode_mode="complex",
        )
        got = ep.calibrate.compute_Sv(
            ed, ecs_file=str(ecs), waveform_mode="BB", encode_mode="complex"
        )
        # env params: ECS values flow through identically
        for k in ("sound_speed", "temperature", "salinity", "pressure"):
            rv = float(np.asarray(
                getattr(ref_cal.env_params[k], "values", ref_cal.env_params[k])
            ).ravel()[0])
            gv = float(np.asarray(got[k].values).ravel()[0])
            np.testing.assert_allclose(gv, rv, rtol=1e-12, err_msg=k)
        # narrowband cal params (non-BB-table) match
        for k in ("sa_correction", "equivalent_beam_angle"):
            rv = np.asarray(ref_cal.cal_params[k].values, dtype="f8").ravel()
            gv = np.asarray(got[k].values, dtype="f8").ravel()
            np.testing.assert_allclose(gv[: rv.size], rv, rtol=1e-12, err_msg=k)


class TestEK80ECSBBGainTableSvDifferential:
    """Round-4 (VERDICT item 5): compute_Sv(ecs_file=) with an EK80 wideband
    gain TABLE, compared at the Sv level against the reference's full chain
    ecs_ev2ep -> conform_channel_order -> _assimilate_ecs_cal_params ->
    _get_interp_da (reference: calibrate/ecs.py:306,402 ->
    calibrate_ek.py:406-456 -> cal_params.py:165-258) executing on the
    facade.  One channel interpolates its table at the per-ping center
    frequency; the other falls back to the narrowband TransducerGain."""

    def _setup(self, tmp_path):
        from test_ecs import ECS_EK80_BB_HZ_CONTENT

        ecs = tmp_path / "bbhz.ecs"
        ecs.write_text(ECS_EK80_BB_HZ_CONTENT)
        raw = tmp_path / "EBBG-D20210201-T000000.raw"
        # two FM channels: ES70 (has a table spanning its 67.5 kHz center
        # frequency) + ES200 (no table -> narrowband fallback)
        write_ek80_raw(raw, n_pings=5, n_samples=64,
                       with_power_channel=False, extra_fm_channel=True)
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        return str(ecs), ed

    def test_sv_level(self, tmp_path):
        ecs, ed = self._setup(tmp_path)
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None, ecs_file=ecs,
            waveform_mode="BB", encode_mode="complex",
        )
        ref_sv = ref_cal.compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, ecs_file=ecs, waveform_mode="BB", encode_mode="complex",
            precision="float64",
        )

        # interpolated gain is applied (not the narrowband fallback) on the
        # table channel, exact on both sides
        rg = np.asarray(ref_cal.cal_params["gain_correction"].values, dtype="f8")
        og = np.asarray(our_sv["gain_correction"].values, dtype="f8")
        assert og.shape == rg.shape
        np.testing.assert_allclose(og, rg, rtol=0, atol=1e-12)
        assert not np.allclose(rg[0], 26.50)  # must differ from TransducerGain

        w = np.asarray(
            ref_sv["Sv"].transpose("channel", "ping_time", "range_sample").values,
            dtype="f8",
        )
        g = np.asarray(our_sv["Sv"].values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        # residual floor = the reference's own complex64 pulse-compression
        # quantization (same as the plain BB differential)
        np.testing.assert_allclose(g[m], w[m], rtol=0, atol=5e-6)

    def test_out_of_band_table_nan_parity(self, tmp_path):
        """A kHz-axis table (never spanning the Hz center frequency) yields
        NaN gain on BOTH sides — the reference applies no unit conversion to
        the table axis, and neither do we."""
        from test_ecs import ECS_EK80_BB_CONTENT

        ecs = tmp_path / "bbkhz.ecs"
        ecs.write_text(ECS_EK80_BB_CONTENT)
        raw = tmp_path / "EBBK-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=3, n_samples=48,
                       with_power_channel=False, with_cw_complex=False)
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None, ecs_file=str(ecs),
            waveform_mode="BB", encode_mode="complex",
        )
        rg = np.asarray(ref_cal.cal_params["gain_correction"].values, dtype="f8")
        our_sv = ep.calibrate.compute_Sv(
            ed, ecs_file=str(ecs), waveform_mode="BB", encode_mode="complex",
            precision="float64",
        )
        og = np.asarray(our_sv["gain_correction"].values, dtype="f8")
        assert np.isnan(rg).all() and np.isnan(og).all()


class TestRaggedConfigSweepDifferential:
    """Randomized-shape sweep: ragged pings, per-channel widths, and skipped
    pings through the FULL reference pipeline (parse -> rectangularize ->
    SetGroups -> CalibrateEK60) vs our open_raw -> compute_Sv, at the f64
    machine-epsilon contract.  Catches shape-edge divergences a single
    fixed-shape differential can miss."""

    @pytest.mark.parametrize("cfg", [
        dict(n_pings=9, n_samples=33, ragged=True, seed=21),
        dict(n_pings=7, n_samples=26, per_channel_samples=(26, 19), seed=22),
        dict(n_pings=11, n_samples=24, skip_pings={2: {3, 7}}, seed=23),
        dict(n_pings=8, n_samples=31, ragged=True, skip_pings={1: {2}}, seed=24),
    ])
    def test_sv_matches_reference(self, tmp_path, cfg):
        raw = tmp_path / f"RS{cfg['seed']}-D20200101-T000000.raw"
        write_ek60_raw(raw, **cfg)
        ed = ep.open_raw(str(raw), sonar_model="EK60")
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK60(_fake(ed), None, None, None)
        ref_sv = ref_cal.compute_Sv()
        our_sv = ep.calibrate.compute_Sv(ed, precision="float64")
        delta = _sv_delta(ref_sv, our_sv)
        assert delta < 1e-9, f"{cfg}: Sv differs by {delta} dB"
        # NaN layout identical too (ragged padding / skipped pings)
        w = np.asarray(
            ref_sv["Sv"].transpose("channel", "ping_time", "range_sample").values
        )
        g = np.asarray(our_sv["Sv"].values)
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w), err_msg=str(cfg))


class TestEK80ConfigSweepDifferential:
    """EK80 complex-path shape sweep: skipped pings, float16 complex
    samples, and an extra FM channel through the reference CalibrateEK80 vs
    our compute_Sv at the BB residual floor."""

    @pytest.mark.parametrize("cfg", [
        dict(n_pings=6, n_samples=48, with_power_channel=False,
             with_cw_complex=False, seed=31),
        dict(n_pings=6, n_samples=48, with_power_channel=False,
             extra_fm_channel=True, seed=32),
        dict(n_pings=6, n_samples=48, with_power_channel=False,
             with_cw_complex=False, complex_f16=True, seed=33),
        dict(n_pings=8, n_samples=40, with_power_channel=False,
             with_cw_complex=False, skip_pings={CH_BB: {2, 5}}, seed=34),
    ])
    def test_bb_sv_matches_reference(self, tmp_path, cfg):
        from synth_ek80 import CH_BB, write_ek80_raw as w80

        raw = tmp_path / f"K{cfg['seed']}-D20210201-T000000.raw"
        w80(raw, **cfg)
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        ref_ek = load_ref("calibrate/calibrate_ek")
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed), env_params=None, cal_params=None,
            waveform_mode="BB", encode_mode="complex",
        )
        ref_sv = ref_cal.compute_Sv()
        our_sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="BB", encode_mode="complex", precision="float64"
        )
        delta = _sv_delta(ref_sv, our_sv)
        assert delta < 5e-6, f"{cfg}: BB Sv differs by {delta} dB"
        w = np.asarray(
            ref_sv["Sv"].transpose("channel", "ping_time", "range_sample").values
        )
        g = np.asarray(our_sv["Sv"].values)
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w), err_msg=str(cfg))


class TestAZFPAveragedSweepDifferential:
    """AZFP data_type=1 (instrument-averaged profiles: per-bin u32 linear
    sums + overflow counters over ping_per_profile) through the reference
    CalibrateAZFP vs ours — the payload branch the fixed-shape differential
    doesn't hit (reference parse_azfp.py:455-482)."""

    @pytest.mark.parametrize("cal_type", ["Sv", "TS"])
    def test_averaged_cal_matches_reference(self, tmp_path, cal_type):
        from synth_azfp import write_azfp_raw, write_azfp_xml

        raw = tmp_path / "23010200.01A"
        xml = tmp_path / "cfg.xml"
        write_azfp_raw(raw, n_pings=6, averaged=True, seed=4)
        write_azfp_xml(xml)
        ed = ep.open_raw(raw, sonar_model="AZFP", xml_path=str(xml))
        ref_mod = load_ref("calibrate/calibrate_azfp")
        fake = FakeEchoData(
            {p: ed[p] for p in ("Sonar/Beam_group1", "Environment", "Vendor_specific")},
            ed.sonar_model,
        )
        env = {"salinity": 31.0, "pressure": 12.0, "temperature": 7.5}
        cal = ref_mod.CalibrateAZFP(fake, env_params=dict(env))
        want = cal.compute_Sv() if cal_type == "Sv" else cal.compute_TS()
        got = (
            ep.calibrate.compute_Sv(ed, env_params=dict(env))
            if cal_type == "Sv"
            else ep.calibrate.compute_TS(ed, env_params=dict(env))
        )
        var = cal_type
        w = np.asarray(
            want[var].transpose("channel", "ping_time", "range_sample").values, "f8"
        )
        g = np.asarray(got[var].values, "f8")
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
        m = ~np.isnan(w)
        np.testing.assert_allclose(g[m], w[m], rtol=0, atol=1e-10)
