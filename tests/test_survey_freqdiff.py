"""Fused frequency-differencing masked MVBS (VERDICT r2 item 10).

The fused kernel (mask inside the Sv+binning device pass, no full-resolution
Sv materialized) must reproduce the unfused reference chain:
compute_Sv -> frequency_differencing -> apply_mask -> compute_MVBS.
"""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.parallel import make_mesh, run_survey_mvbs, run_survey_mvbs_from_raw

from synth_ek60 import write_ek60_raw


@pytest.fixture(scope="module")
def ek60_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fd_survey")
    path = tmp / "FD-D20200101-T000000.raw"
    write_ek60_raw(path, n_pings=40, n_samples=120)
    return path


def _unfused_masked_mvbs(ed, chanABEq, range_bin_m, ping_time_bin):
    # f32 so the mask's threshold comparisons are evaluated on the same
    # arithmetic as the fused kernel (knife-edge samples flip otherwise)
    ds = ep.calibrate.compute_Sv(ed, precision="float32")
    mask = ep.mask.frequency_differencing(ds, chanABEq=chanABEq)
    masked = ep.mask.apply_mask(ds, mask)
    return ep.commongrid.compute_MVBS(
        masked, range_bin=f"{range_bin_m}m", ping_time_bin=ping_time_bin
    )


class TestFusedFreqDiff:
    def test_from_raw_matches_unfused_chain(self, ek60_file):
        # range_bin 21.3 m keeps bin edges away from the echo_range sample
        # grid: the unfused chain bins f32 echo_range values, so a sample
        # whose f64 range sits within f32 rounding of an edge can land one
        # bin off there (the fused kernel's closed-form sample-index bounds
        # are exact and match the f64 oracle — verified while building this
        # test with 20 m bins, where exactly such a knife-edge sample exists)
        ed = ep.open_raw(ek60_file, sonar_model="EK60")
        chans = [str(c) for c in ed["Sonar/Beam_group1"].coords["channel"].values]
        eq = f'"{chans[0]}" - "{chans[1]}" > 3.0dB'
        want = _unfused_masked_mvbs(ed, eq, 21.3, "5s")
        got = run_survey_mvbs_from_raw(
            [ek60_file], sonar_model="EK60", range_bin_m=21.3,
            ping_time_bin="5s", chunk_pings=16, freq_diff=eq,
        )
        gv = got["Sv"].values
        wv = want["Sv"].transpose("channel", "ping_time", "echo_range").values
        nb = min(gv.shape[1], wv.shape[1])
        nr = min(gv.shape[2], wv.shape[2])
        g, w = gv[:, :nb, :nr], wv[:, :nb, :nr]
        assert np.array_equal(np.isnan(g), np.isnan(w))
        d = np.abs(g - w)
        assert np.nanmax(np.where(np.isnan(d), 0, d)) < 2e-4

    def test_freq_equation_form(self, ek60_file):
        got = run_survey_mvbs_from_raw(
            [ek60_file], sonar_model="EK60", range_bin_m=20.0,
            ping_time_bin="5s", freq_diff="38kHz - 18kHz > 3.0dB",
        )
        byname = run_survey_mvbs_from_raw(
            [ek60_file], sonar_model="EK60", range_bin_m=20.0,
            ping_time_bin="5s",
            freq_diff={"freqA": 38000.0, "freqB": 18000.0, "operator": ">", "diff": 3.0},
        )
        np.testing.assert_allclose(
            got["Sv"].values, byname["Sv"].values, rtol=0, atol=0, equal_nan=True
        )

    def test_mesh_matches_single_device(self, ek60_file):
        eq = "38kHz - 18kHz > 3.0dB"
        kw = dict(sonar_model="EK60", range_bin_m=20.0, ping_time_bin="5s",
                  chunk_pings=16, freq_diff=eq)
        single = run_survey_mvbs_from_raw([ek60_file], **kw)
        mesh = make_mesh(n_devices=8, channel_axis=1)
        sharded = run_survey_mvbs_from_raw([ek60_file], mesh=mesh, **kw)
        np.testing.assert_allclose(
            np.asarray(sharded["Sv"].values), np.asarray(single["Sv"].values),
            rtol=0, atol=1e-6, equal_nan=True,
        )

    def test_channel_sharded_mesh_rejected(self, ek60_file):
        mesh = make_mesh(n_devices=8, channel_axis=2)
        with pytest.raises(ValueError, match="channel mesh axis"):
            run_survey_mvbs_from_raw(
                [ek60_file], sonar_model="EK60", mesh=mesh,
                freq_diff="38kHz - 18kHz > 3.0dB",
            )

    def test_quiet_bin_no_cancellation(self):
        """Regression: a quiet range bin after loud samples must keep full
        precision.  The r2 cumsum range reduction lost it entirely (f32
        prefix cancellation -> bin sum exactly 0 -> -inf dB); the uniform-grid
        banded matmul accumulates each bin independently."""
        from echopype_tpu.xrlite import Dataset

        n_p, n_r = 8, 64
        sv = np.full((1, n_p, n_r), -20.0, dtype="f4")  # loud
        sv[:, :, n_r // 2 :] = -150.0  # very quiet second half
        er = np.broadcast_to(np.arange(n_r, dtype="f4") * 1.0, (1, n_p, n_r)).copy()
        ds = Dataset(
            {
                "Sv": (("channel", "ping_time", "range_sample"), sv),
                "echo_range": (("channel", "ping_time", "range_sample"), er),
            },
            coords={
                "channel": np.array(["ch0"], dtype=object),
                "ping_time": np.datetime64("2022-01-01", "ns")
                + np.arange(n_p).astype("timedelta64[s]").astype("timedelta64[ns]"),
                "range_sample": np.arange(n_r),
            },
        )
        mv = ep.commongrid.compute_MVBS(ds, range_bin="32m", ping_time_bin="100s")
        v = mv["Sv"].values[0, 0]
        assert np.isfinite(v).all(), f"quiet bin lost: {v}"
        np.testing.assert_allclose(v, [-20.0, -150.0], atol=1e-4)

    def test_sv_store_streamer_freq_diff(self, ek60_file):
        ed = ep.open_raw(ek60_file, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        eq = "38kHz - 18kHz > 3.0dB"
        mask = ep.mask.frequency_differencing(ds, freqABEq=eq)
        masked = ep.mask.apply_mask(ds, mask)
        want = run_survey_mvbs([masked], range_bin_m=20.0, ping_time_bin="5s")
        got = run_survey_mvbs(
            [ds], range_bin_m=20.0, ping_time_bin="5s", freq_diff=eq, chunk_pings=16
        )
        np.testing.assert_allclose(
            got["Sv"].values, want["Sv"].values, rtol=0, atol=1e-5, equal_nan=True
        )


class TestComplexFreqDiff:
    """Fused freq_diff for complex/BB raw streaming (round-4 closure of the
    survey.py:818 NotImplementedError)."""

    def _bb_files(self, tmp_path, n=2):
        from synth_ek80 import write_ek80_raw

        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        files = []
        for i in range(n):
            raw = tmp_path / f"FDBB{i}-D20210201-T000000.raw"
            # two FM channels (extra_fm_channel) -> the complex-FM beam
            # group carries both, which the differencing mask needs
            write_ek80_raw(raw, n_pings=10, n_samples=96, seed=i,
                           t0=t0 + np.timedelta64(12 * i, "s"),
                           with_power_channel=False, extra_fm_channel=True)
            files.append(str(raw))
        return files

    def _eq_of(self, files):
        ed = ep.open_raw(files[0], sonar_model="EK80")
        from echopype_tpu.echodata.simrad import retrieve_correct_beam_group

        bp = retrieve_correct_beam_group(ed, "BB", "complex")
        chans = [str(c) for c in ed[bp].coords["channel"].values]
        assert len(chans) >= 2
        return f'"{chans[0]}" - "{chans[1]}" > 3.0dB'

    def _composed(self, files, eq, kw):
        """Reference chain per file: compute_Sv (f32 device path, matching
        the streamer) -> frequency_differencing -> apply_mask -> store
        streamer."""
        masked = []
        for f in files:
            ed = ep.open_raw(f, sonar_model="EK80")
            ds = ep.calibrate.compute_Sv(
                ed, waveform_mode="BB", encode_mode="complex", precision="float32"
            )
            m = ep.mask.frequency_differencing(ds, chanABEq=eq)
            masked.append(ep.mask.apply_mask(ds, m))
        return run_survey_mvbs(masked, **kw)

    def test_chunked_bb_matches_composed(self, tmp_path):
        files = self._bb_files(tmp_path)
        eq = self._eq_of(files)
        kw = dict(range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4)
        want = self._composed(files, eq, kw)
        got = run_survey_mvbs_from_raw(
            files, sonar_model="EK80", waveform_mode="BB",
            encode_mode="complex", freq_diff=eq, **kw
        )
        g = np.asarray(got["Sv"].values)
        w = np.asarray(want["Sv"].values)
        nb, nr = min(g.shape[1], w.shape[1]), min(g.shape[2], w.shape[2])
        np.testing.assert_allclose(
            g[:, :nb, :nr], w[:, :nb, :nr], rtol=0, atol=2e-4, equal_nan=True
        )

    def test_fused_bb_matches_chunked(self, tmp_path):
        files = self._bb_files(tmp_path)
        eq = self._eq_of(files)
        kw = dict(
            sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
            range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4, freq_diff=eq,
        )
        chunked = run_survey_mvbs_from_raw(files, **kw)
        fused = run_survey_mvbs_from_raw(files, device_fused=True, **kw)
        a = np.asarray(chunked["Sv"].values)
        b = np.asarray(fused["Sv"].values)
        assert a.shape == b.shape
        # float32-fused vs f32-chunked: same tolerance regime as the unmasked
        # fused test (knife-edge last bin aside)
        np.testing.assert_allclose(b[:, :, :-1], a[:, :, :-1], rtol=0,
                                   atol=5e-3, equal_nan=True)

    def test_mask_changes_bb_result(self, tmp_path):
        files = self._bb_files(tmp_path, n=1)
        eq = self._eq_of(files)
        kw = dict(
            sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
            range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4,
        )
        plain = run_survey_mvbs_from_raw(files, **kw)
        masked = run_survey_mvbs_from_raw(files, freq_diff=eq, **kw)
        a, b = np.asarray(plain["Sv"].values), np.asarray(masked["Sv"].values)
        assert not np.array_equal(np.nan_to_num(a), np.nan_to_num(b))
