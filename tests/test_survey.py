"""Survey runner: streamed global MVBS equals in-memory compute_MVBS."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.parallel.survey import run_survey_mvbs
from echopype_tpu.utils.profiling import StageTimer

from synth_ek60 import write_ek60_raw


class TestSurveyRunner:
    def test_streamed_equals_combined(self, tmp_path):
        sv_stores = []
        eds = []
        for i in range(3):
            raw = tmp_path / f"V{i}-D2020010{i+1}-T000000.raw"
            write_ek60_raw(
                raw,
                n_pings=25,
                n_samples=80,
                t0=np.datetime64("2020-01-01T00:00:00", "ns") + np.timedelta64(i * 40, "s"),
                seed=i,
            )
            ed = ep.open_raw(raw, sonar_model="EK60")
            eds.append(ed)
            ds_Sv = ep.calibrate.compute_Sv(ed)
            store = tmp_path / f"V{i}_Sv.zarr"
            ds_Sv.to_zarr(store)
            sv_stores.append(str(store))

        timer = StageTimer()
        mvbs_stream = run_survey_mvbs(
            sv_stores, range_bin_m=5.0, ping_time_bin="20s", chunk_pings=10, timer=timer
        )

        # reference: combine then one-shot MVBS
        combined = ep.combine_echodata(eds)
        ds_Sv_all = ep.calibrate.compute_Sv(combined)
        mvbs_ref = ep.commongrid.compute_MVBS(ds_Sv_all, range_bin="5m", ping_time_bin="20s")

        np.testing.assert_array_equal(
            mvbs_stream.coords["ping_time"].values, mvbs_ref.coords["ping_time"].values
        )
        np.testing.assert_allclose(
            mvbs_stream["Sv"].values, mvbs_ref["Sv"].values, atol=1e-4, rtol=0,
            equal_nan=True,
        )
        report = timer.report(log=False)
        assert "device_binning" in report and report["device_binning"]["count"] >= 9

    def test_reference_style_bin_strings(self, tmp_path):
        """Round-5 API unification: the survey runners accept reference-style
        bin strings (range_bin='5m', like compute_MVBS) as the primary
        spelling; bare floats and range_bin_m= stay as deprecated aliases."""
        from echopype_tpu.parallel.survey import run_survey_mvbs_from_raw

        raw = tmp_path / "B-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=10, n_samples=60)
        ed = ep.open_raw(raw, sonar_model="EK60")
        sv = ep.calibrate.compute_Sv(ed)
        a = run_survey_mvbs([sv], range_bin="5m", ping_time_bin="2s")
        b = run_survey_mvbs([sv], range_bin_m=5.0, ping_time_bin="2s")
        c = run_survey_mvbs([sv], range_bin=5.0, ping_time_bin="2s")
        np.testing.assert_array_equal(a["Sv"].values, b["Sv"].values)
        np.testing.assert_array_equal(a["Sv"].values, c["Sv"].values)
        d = run_survey_mvbs_from_raw([str(raw)], sonar_model="EK60",
                                     range_bin="5m", ping_time_bin="2s")
        e = run_survey_mvbs_from_raw([str(raw)], sonar_model="EK60",
                                     range_bin_m=5.0, ping_time_bin="2s")
        np.testing.assert_array_equal(d["Sv"].values, e["Sv"].values)

    def test_reversed_ping_time_rejected(self, tmp_path):
        """The window kernels need non-decreasing bin ids; reversed times must
        fail loudly, pointing at qc.coerce_increasing_time."""
        raw = tmp_path / "R-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=6, n_samples=30)
        ed = ep.open_raw(raw, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        pt = np.asarray(ds.coords["ping_time"].values).copy()
        pt[2], pt[3] = pt[3], pt[2]
        ds = ds.assign_coords(ping_time=pt)
        with pytest.raises(ValueError, match="coerce_increasing_time"):
            run_survey_mvbs([ds], ping_time_bin="2s")

    def test_channel_mismatch_rejected(self, tmp_path):
        raw = tmp_path / "W-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=5, n_samples=30)
        ed = ep.open_raw(raw, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        ds2 = ds.isel(channel=[0])
        with pytest.raises(ValueError):
            run_survey_mvbs([ds, ds2])


class TestRawSurveyStreamer:
    def test_matches_compute_sv_plus_mvbs(self, tmp_path):
        """raw->MVBS streamer equals open_raw + compute_Sv + compute_MVBS."""
        import numpy as np

        import echopype_tpu as ep
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek60 import write_ek60_raw

        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        files = []
        for i in range(2):
            raw = tmp_path / f"S{i}-D20200101-T000000-EK60.raw"
            write_ek60_raw(raw, n_pings=40, n_samples=300,
                           t0=t0 + np.timedelta64(i * 40, "s"), seed=i)
            files.append(raw)

        mvbs = run_survey_mvbs_from_raw(files, sonar_model="EK60",
                                        range_bin_m=5.0, ping_time_bin="10s",
                                        chunk_pings=17)  # force padding path

        # oracle: the standard per-file path
        eds = [ep.open_raw(f, sonar_model="EK60") for f in files]
        svs = [ep.calibrate.compute_Sv(ed) for ed in eds]
        combined_parts = []
        for sv in svs:
            m = ep.commongrid.compute_MVBS(sv, range_bin="5m", ping_time_bin="10s")
        # compare on the streamer's own grid using linear-domain accumulation
        from echopype_tpu.ops import binning
        from echopype_tpu.commongrid.utils import ping_time_bin_edges

        pts = np.concatenate([np.asarray(sv.coords["ping_time"].values) for sv in svs])
        edges = ping_time_bin_edges(np.array([pts.min(), pts.max()]), "10s")
        r_edges = np.asarray(mvbs.coords["echo_range"].values)
        r_edges = np.append(r_edges, r_edges[-1] + 5.0).astype("f4")
        n_x = len(edges) - 1
        sums = np.zeros((2, n_x, len(r_edges) - 1))
        counts = np.zeros_like(sums)
        for sv in svs:
            pt = np.asarray(sv.coords["ping_time"].values).astype("i8")
            xb = binning.x_bounds_np(pt, edges.astype("i8"))
            s, c, _ = binning.binned_sum_partials(
                np.asarray(sv["Sv"].values, "f4"),
                np.asarray(sv["echo_range"].values, "f4"),
                r_edges, xb)
            sums += np.asarray(s, "f8")
            counts += np.asarray(c, "f8")
        with np.errstate(invalid="ignore", divide="ignore"):
            expect = np.where(counts > 0, 10*np.log10(sums/np.maximum(counts, 1)), np.nan)
        got = np.asarray(mvbs["Sv"].values)
        assert got.shape == expect.shape
        # two float32 formulations (closed-form bounds vs digitize on
        # echo_range) agree to ~0.02 dB; assert well inside survey tolerance
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=5e-2)

    def test_per_channel_skipped_pings(self, tmp_path):
        """Per-channel ping dropouts must not poison fused bins.

        A channel absent at some union ping_times carries NaN rows in the
        per-ping cal params; the fused kernels derive bin bounds from the
        chunk's FIRST ping (dr[:, 0]) and closed-form counts from k0(dr) —
        before the _sanitize_power_cal_inputs sanitation, a chunk starting
        on a missing ping lost the channel's whole chunk (NaN bounds ->
        empty membership) and NaN k0 NaN-poisoned every window bin's counts
        (found by the `survey` soak mode: all-NaN channels on the plain
        path, 1.5 dB errors on fused freq_diff).
        """
        import numpy as np

        import echopype_tpu as ep
        from echopype_tpu.parallel import run_survey_mvbs, run_survey_mvbs_from_raw
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "SKIP-D20200101-T000000.raw"
        # skips hit chunk starts (pings 6 and 12 with chunk_pings=3)
        write_ek60_raw(raw, n_pings=30, n_samples=79, seed=143667987,
                       t0=np.datetime64("2020-01-01T00:00:00", "ns"),
                       skip_pings={1: {1, 5, 6, 12, 17, 22, 25}})
        kw = dict(range_bin_m=15.97, ping_time_bin="10s", chunk_pings=3)
        sv = ep.calibrate.compute_Sv(
            ep.open_raw(raw, sonar_model="EK60"), precision="float32")
        want = run_survey_mvbs([sv], **kw)

        def assert_close(got, wanted, atol=1e-5):
            g = np.asarray(got["Sv"].values, "f8")
            w = np.asarray(wanted["Sv"].values, "f8")
            assert np.array_equal(np.isnan(g), np.isnan(w))
            np.testing.assert_allclose(
                np.nan_to_num(g), np.nan_to_num(w), atol=atol, rtol=0)

        for prefetch in (False, True):
            got = run_survey_mvbs_from_raw(
                [raw], sonar_model="EK60", prefetch=prefetch, **kw)
            assert_close(got, want)

        chans = [str(c) for c in sv.coords["channel"].values]
        eq = f'"{chans[0]}" - "{chans[1]}" > 1.94dB'
        gotf = run_survey_mvbs_from_raw([raw], sonar_model="EK60",
                                        freq_diff=eq, **kw)
        m = ep.mask.frequency_differencing(sv, chanABEq=eq)
        wantf = run_survey_mvbs([ep.mask.apply_mask(sv, m)], **kw)
        # fused in-kernel Sv vs compute_Sv f32 round differently near the
        # threshold; masks agree here, values within f32 bin-sum noise
        assert_close(gotf, wantf, atol=3e-5)

    def test_channel_missing_first_ping(self, tmp_path):
        """A channel whose FIRST ping is missing must stream as all-NaN.

        The reference's cal-param chain resolves an all-NaN gain offset for
        such a channel, so compute_Sv (ours matches the reference to 3e-14
        dB) yields NaN for every ping of it — including pings that carry
        power.  The fused streamer must exclude those power-bearing pings
        too (param-NaN rows NaN the power in _sanitize_power_cal_inputs),
        not fabricate bins with filled params.
        """
        import numpy as np

        import echopype_tpu as ep
        from echopype_tpu.parallel import run_survey_mvbs, run_survey_mvbs_from_raw
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "SK0-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=24, n_samples=60, seed=7, ragged=True,
                       t0=np.datetime64("2020-01-01T00:00:00", "ns"),
                       skip_pings={1: {0, 6, 12}})
        kw = dict(range_bin_m=4.0, ping_time_bin="10s", chunk_pings=5)
        sv = ep.calibrate.compute_Sv(
            ep.open_raw(raw, sonar_model="EK60"), precision="float32")
        svv = np.asarray(sv["Sv"].values)
        dead = [c for c in range(svv.shape[0]) if np.isnan(svv[c]).all()]
        assert dead, "expected the first-ping-missing channel to be all-NaN"
        want = run_survey_mvbs([sv], **kw)
        w = np.asarray(want["Sv"].values, "f8")
        for prefetch in (False, True):
            got = run_survey_mvbs_from_raw(
                [raw], sonar_model="EK60", prefetch=prefetch, **kw)
            g = np.asarray(got["Sv"].values, "f8")
            assert np.array_equal(np.isnan(g), np.isnan(w)), prefetch
            np.testing.assert_allclose(
                np.nan_to_num(g), np.nan_to_num(w), atol=1e-5, rtol=0)

    def test_rejects_other_models(self, tmp_path):
        import pytest

        from echopype_tpu.parallel import run_survey_mvbs_from_raw

        with pytest.raises(ValueError, match="power"):
            run_survey_mvbs_from_raw([], sonar_model="AD2CP")

    def test_azfp_matches_compute_sv_path(self, tmp_path):
        """AZFP raw->MVBS streamer (affine echo_range, r0 intercept) matches
        the compute_Sv + linear binning path."""
        import numpy as np

        import echopype_tpu as ep
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_azfp import write_azfp_raw, write_azfp_xml

        xml = tmp_path / "instrument.XML"
        write_azfp_xml(xml)
        raw = tmp_path / "20AZ.01A"
        write_azfp_raw(raw, n_pings=6)
        env = {"salinity": 32.0, "pressure": 60.0}
        mvbs = run_survey_mvbs_from_raw([raw], sonar_model="AZFP", xml_path=str(xml),
                                        range_bin_m=2.0, ping_time_bin="5s",
                                        env_params=env, chunk_pings=4)
        ed = ep.open_raw(raw, sonar_model="AZFP", xml_path=str(xml))
        sv = ep.calibrate.compute_Sv(ed, env_params=env)
        from echopype_tpu.commongrid.utils import ping_time_bin_edges
        from echopype_tpu.ops import binning

        pt = np.asarray(sv.coords["ping_time"].values)
        edges = ping_time_bin_edges(np.array([pt.min(), pt.max()]), "5s")
        r_edges = np.asarray(mvbs.coords["echo_range"].values)
        r_edges = np.append(r_edges, r_edges[-1] + 2.0).astype("f4")
        xb = binning.x_bounds_np(pt.astype("i8"), edges.astype("i8"))
        er = np.asarray(sv["echo_range"].values, "f4")
        svv = np.asarray(sv["Sv"].values, "f4")
        if er.shape != svv.shape:
            er = np.broadcast_to(er, svv.shape)
        s_, c_, _ = binning.binned_sum_partials(svv, er, r_edges, xb)
        with np.errstate(invalid="ignore", divide="ignore"):
            want = np.where(np.asarray(c_) > 0,
                            10 * np.log10(np.asarray(s_) / np.maximum(np.asarray(c_), 1)),
                            np.nan)
        got = np.asarray(mvbs["Sv"].values)
        nx = min(got.shape[1], want.shape[1])
        np.testing.assert_allclose(got[:, :nx], want[:, :nx], rtol=2e-3, atol=5e-2)

    def test_ek80_power_mode(self, tmp_path):
        """EK80 power channels stream raw->MVBS and match compute_Sv+binning."""
        import numpy as np

        import echopype_tpu as ep
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "E85-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=12, n_samples=96,
                       with_cw_complex=False)  # BB complex + GPT power
        # keep only the power channel by dropping complex ones? the streamer
        # uses the power beam group, which holds just the GPT channel
        mvbs = run_survey_mvbs_from_raw([raw], sonar_model="EK80",
                                        range_bin_m=5.0, ping_time_bin="5s",
                                        chunk_pings=5)
        assert np.isfinite(mvbs["Sv"].values).any()

        ed = ep.open_raw(raw, sonar_model="EK80")
        sv = ep.calibrate.compute_Sv(ed, waveform_mode="CW", encode_mode="power")
        ref = ep.commongrid.compute_MVBS(sv, range_bin="5m", ping_time_bin="5s")
        got = np.asarray(mvbs["Sv"].values)
        want = np.asarray(ref["Sv"].values)
        nr = min(got.shape[2], want.shape[2])
        nx = min(got.shape[1], want.shape[1])
        np.testing.assert_allclose(got[:, :nx, :nr], want[:, :nx, :nr],
                                   rtol=2e-3, atol=5e-2)


class TestStreamerWithSwap:
    def test_swap_backed_files_stream(self, tmp_path):
        """use_swap=True conversion inside the streamer: memmap-backed power
        blocks stream to the device without copies breaking anything."""
        import numpy as np

        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek60 import write_ek60_raw

        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        files = []
        for i in range(2):
            f = tmp_path / f"SW{i}-D20200101-T000000-EK60.raw"
            write_ek60_raw(f, n_pings=30, n_samples=200,
                           t0=t0 + np.timedelta64(i * 30, "s"), seed=i)
            files.append(f)
        m_swap = run_survey_mvbs_from_raw(files, range_bin_m=10.0,
                                          ping_time_bin="10s", use_swap=True)
        m_mem = run_survey_mvbs_from_raw(files, range_bin_m=10.0,
                                         ping_time_bin="10s", use_swap=False)
        np.testing.assert_array_equal(
            np.asarray(m_swap["Sv"].values), np.asarray(m_mem["Sv"].values)
        )


class TestAzfp6Streamer:
    def test_azfp6_streams(self, tmp_path):
        import numpy as np

        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from test_azfp6 import write_azfp6_raw

        raw = tmp_path / "23090100.azfp"
        write_azfp6_raw(raw, n_pings=6)
        mvbs = run_survey_mvbs_from_raw(
            [raw], sonar_model="AZFP6", range_bin_m=2.0, ping_time_bin="5s",
            env_params={"salinity": 32.0, "pressure": 60.0})
        assert np.isfinite(mvbs["Sv"].values).any()


class TestMeshSurveyRunner:
    """End-to-end sharded survey (SURVEY.md §2.6): mesh path equals 1-device."""

    def _make_stores(self, tmp_path, n_files=2, n_pings=30):
        files = []
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        for i in range(n_files):
            raw = tmp_path / f"M{i}-D20200101-T000000.raw"
            write_ek60_raw(raw, n_pings=n_pings, n_samples=120,
                           t0=t0 + np.timedelta64(i * 40, "s"), seed=i)
            files.append(raw)
        return files

    def test_sv_streamer_mesh_equals_single(self, tmp_path):
        from echopype_tpu.parallel import make_mesh

        files = self._make_stores(tmp_path)
        svs = [
            ep.calibrate.compute_Sv(ep.open_raw(f, sonar_model="EK60")) for f in files
        ]
        # chunk size divisible by the mesh ping axis (4) so both paths see
        # identical chunk boundaries: the f32 prefix-sum binning is only
        # reproducible for identical chunking (cumsum rounding shifts with
        # the partial-sum split otherwise)
        kw = dict(range_bin_m=5.0, ping_time_bin="20s", chunk_pings=16)
        single = run_survey_mvbs(svs, **kw)
        mesh = make_mesh(n_devices=8, channel_axis=2)
        sharded = run_survey_mvbs(svs, mesh=mesh, **kw)
        np.testing.assert_array_equal(
            single.coords["ping_time"].values, sharded.coords["ping_time"].values
        )
        np.testing.assert_allclose(
            sharded["Sv"].values, single["Sv"].values, rtol=0, atol=1e-4,
            equal_nan=True,
        )

    def test_sv_streamer_mesh_handles_interior_nans(self, tmp_path):
        from echopype_tpu.parallel import make_mesh

        files = self._make_stores(tmp_path, n_files=1)
        sv = ep.calibrate.compute_Sv(ep.open_raw(files[0], sonar_model="EK60"))
        vals = np.asarray(sv["Sv"].values).copy()
        vals[:, 3:7, 10:30] = np.nan  # masked interior block
        sv["Sv"] = (sv["Sv"].dims, vals)
        kw = dict(range_bin_m=5.0, ping_time_bin="10s", chunk_pings=8)
        single = run_survey_mvbs([sv], **kw)
        sharded = run_survey_mvbs([sv], mesh=make_mesh(n_devices=8, channel_axis=2), **kw)
        np.testing.assert_allclose(
            sharded["Sv"].values, single["Sv"].values, rtol=0, atol=1e-4,
            equal_nan=True,
        )

    def test_raw_streamer_mesh_equals_single(self, tmp_path):
        from echopype_tpu.parallel import make_mesh, run_survey_mvbs_from_raw

        files = self._make_stores(tmp_path)
        kw = dict(sonar_model="EK60", range_bin_m=5.0, ping_time_bin="10s",
                  chunk_pings=16)  # shard-aligned: see chunking note above
        single = run_survey_mvbs_from_raw(files, **kw)
        mesh = make_mesh(n_devices=8, channel_axis=2)
        sharded = run_survey_mvbs_from_raw(files, mesh=mesh, **kw)
        np.testing.assert_array_equal(
            single.coords["ping_time"].values, sharded.coords["ping_time"].values
        )
        np.testing.assert_allclose(
            sharded["Sv"].values, single["Sv"].values, rtol=0, atol=1e-4,
            equal_nan=True,
        )

    def test_mesh_channel_mismatch_rejected(self, tmp_path):
        from echopype_tpu.parallel import make_mesh

        files = self._make_stores(tmp_path, n_files=1)
        sv = ep.calibrate.compute_Sv(ep.open_raw(files[0], sonar_model="EK60"))
        # 2 channels, channel_axis=4 -> indivisible
        mesh = make_mesh(n_devices=8, channel_axis=4)
        with pytest.raises(ValueError, match="divisible"):
            run_survey_mvbs([sv], mesh=mesh)


class TestComplexStreamer:
    """EK80 broadband raw->MVBS streaming (pulse compression per chunk)."""

    def test_bb_streamer_matches_compute_sv(self, tmp_path):
        import echopype_tpu as ep
        from echopype_tpu.commongrid.utils import ping_time_bin_edges
        from echopype_tpu.ops import binning
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek80 import write_ek80_raw

        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        files = []
        for i in range(2):
            raw = tmp_path / f"BB{i}-D20210201-T000000.raw"
            write_ek80_raw(raw, n_pings=10, n_samples=96, seed=i,
                           t0=t0 + np.timedelta64(i * 12, "s"),
                           with_power_channel=False, with_cw_complex=False)
            files.append(raw)

        mvbs = run_survey_mvbs_from_raw(
            files, sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
            range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4,
        )

        # oracle: full-file compute_Sv + window binning on the same grid
        edges = None
        svs = []
        for f in files:
            ed = ep.open_raw(f, sonar_model="EK80")
            svs.append(ep.calibrate.compute_Sv(ed, waveform_mode="BB",
                                               encode_mode="complex"))
        pts = np.concatenate([np.asarray(s.coords["ping_time"].values) for s in svs])
        edges = ping_time_bin_edges(np.array([pts.min(), pts.max()]), "5s")
        r_edges = np.asarray(mvbs.coords["echo_range"].values)
        r_edges = np.append(r_edges, r_edges[-1] + 5.0).astype("f4")
        n_x = len(edges) - 1
        C = len(svs[0].coords["channel"].values)
        sums = np.zeros((C, n_x, len(r_edges) - 1))
        counts = np.zeros_like(sums)
        edges_i8 = edges.astype("datetime64[ns]").astype("i8")
        for sv in svs:
            pt = np.asarray(sv.coords["ping_time"].values).astype("i8")
            x = np.clip(np.searchsorted(edges_i8, pt, side="right") - 1, 0, n_x - 1)
            s, c, _ = binning.binned_window_partials(
                np.asarray(sv["Sv"].values, "f4"),
                np.asarray(sv["echo_range"].values, "f4"),
                r_edges, x.astype("i4"), n_x,
            )
            sums += np.asarray(s, "f8")
            counts += np.asarray(c, "f8")
        with np.errstate(invalid="ignore", divide="ignore"):
            want = np.where(counts > 0, 10 * np.log10(sums / np.maximum(counts, 1)), np.nan)
        got = np.asarray(mvbs["Sv"].values)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5, equal_nan=True)

    def test_bb_streamer_mesh(self, tmp_path):
        from echopype_tpu.parallel import make_mesh, run_survey_mvbs_from_raw
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "BBM-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=16, n_samples=64,
                       with_power_channel=False, with_cw_complex=False)
        kw = dict(sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
                  range_bin_m=5.0, ping_time_bin="5s", chunk_pings=8)
        single = run_survey_mvbs_from_raw([raw], **kw)
        mesh = make_mesh(n_devices=8, channel_axis=1)
        sharded = run_survey_mvbs_from_raw([raw], mesh=mesh, **kw)
        np.testing.assert_allclose(
            np.asarray(sharded["Sv"].values), np.asarray(single["Sv"].values),
            rtol=0, atol=1e-4, equal_nan=True,
        )


class TestFusedComplexStreamer:
    def test_fused_matches_chunked(self, tmp_path):
        """The fully fused device BB path matches the chunked compute_Sv path
        (float32 end-to-end vs float64 host math: ~1e-3 dB)."""
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek80 import write_ek80_raw

        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        files = []
        for i in range(2):
            raw = tmp_path / f"FU{i}-D20210201-T000000.raw"
            write_ek80_raw(raw, n_pings=10, n_samples=96, seed=i,
                           t0=t0 + np.timedelta64(12 * i, "s"),
                           with_power_channel=False, with_cw_complex=False)
            files.append(raw)
        kw = dict(sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
                  range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4)
        chunked = run_survey_mvbs_from_raw(files, **kw)
        fused = run_survey_mvbs_from_raw(files, device_fused=True, **kw)
        a = np.asarray(chunked["Sv"].values)
        b = np.asarray(fused["Sv"].values)
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        # the last range bin can differ by one knife-edge sample: the ping's
        # final PC output is exactly zero (Hann first tap) — the fused conv
        # excludes it like the reference's time-domain convolve, while the
        # chunked FFT path turns it into ~1e-38 and counts a -370 dB sample
        np.testing.assert_allclose(b[:, :, :-1], a[:, :, :-1], rtol=0, atol=5e-3,
                                   equal_nan=True)
        np.testing.assert_allclose(b[:, :, -1], a[:, :, -1], rtol=0, atol=0.2,
                                   equal_nan=True)

    def test_fused_cw_complex(self, tmp_path):
        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "FCW-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=10, n_samples=64,
                       with_power_channel=False, with_cw_complex=True)
        kw = dict(sonar_model="EK80", waveform_mode="CW", encode_mode="complex",
                  range_bin_m=5.0, ping_time_bin="5s", chunk_pings=4)
        chunked = run_survey_mvbs_from_raw([raw], **kw)
        fused = run_survey_mvbs_from_raw([raw], device_fused=True, **kw)
        np.testing.assert_allclose(
            np.asarray(fused["Sv"].values), np.asarray(chunked["Sv"].values),
            rtol=0, atol=5e-3, equal_nan=True,
        )


def test_fused_handles_multi_epoch(tmp_path):
    """device_fused streams multi-filter_time files per (channel, epoch)
    work unit and agrees with the chunked epoch-partitioned path
    (round-3 removal of the r2 NotImplementedError at survey.py:901)."""
    import numpy as _np

    from echopype_tpu.parallel import run_survey_mvbs_from_raw
    from test_ek80_epochs import write_two_epoch_ek80

    raw = tmp_path / "ME-D20210201-T000000.raw"
    write_two_epoch_ek80(raw)
    kw = dict(
        sonar_model="EK80", waveform_mode="CW", encode_mode="complex",
        chunk_pings=4, range_bin_m=5.0, ping_time_bin="5s",
    )
    fused = run_survey_mvbs_from_raw([raw], device_fused=True, **kw)
    chunked = run_survey_mvbs_from_raw([raw], device_fused=False, **kw)
    _np.testing.assert_allclose(
        _np.asarray(fused["Sv"].values), _np.asarray(chunked["Sv"].values),
        rtol=0, atol=5e-3, equal_nan=True,
    )


class TestPrefetchStreamer:
    """The single-pass prefetching path (extent scan + decode-ahead thread)
    must produce bit-identical bins to the eager two-pass path."""

    def _files(self, tmp_path, n_files=3, ragged=False):
        t0 = np.datetime64("2021-06-01T00:00:00", "ns")
        files = []
        for i in range(n_files):
            raw = tmp_path / f"P{i}-EK60.raw"
            write_ek60_raw(
                raw, n_pings=31 + 7 * i, n_samples=257 if not ragged else 200 + 30 * i,
                t0=t0 + np.timedelta64(i * 45, "s"), seed=10 + i,
            )
            files.append(raw)
        return files

    def test_streamed_equals_eager(self, tmp_path):
        from echopype_tpu.parallel import run_survey_mvbs_from_raw

        files = self._files(tmp_path, ragged=True)
        kw = dict(sonar_model="EK60", range_bin_m=7.0, ping_time_bin="15s",
                  chunk_pings=13)
        m_new = run_survey_mvbs_from_raw(files, prefetch=True, **kw)
        m_old = run_survey_mvbs_from_raw(files, prefetch=False, **kw)
        np.testing.assert_array_equal(
            np.asarray(m_new.coords["ping_time"].values),
            np.asarray(m_old.coords["ping_time"].values),
        )
        np.testing.assert_array_equal(
            np.asarray(m_new.coords["echo_range"].values),
            np.asarray(m_old.coords["echo_range"].values),
        )
        np.testing.assert_array_equal(
            np.asarray(m_new["Sv"].values), np.asarray(m_old["Sv"].values)
        )

    def test_scan_matches_decode(self, tmp_path):
        import echopype_tpu as ep
        from echopype_tpu.convert.simrad.framing import scan_ek_extent

        raw = self._files(tmp_path, n_files=1)[0]
        s = scan_ek_extent(raw)
        ed = ep.open_raw(raw, sonar_model="EK60")
        pt = np.asarray(ed["Sonar/Beam_group1"]["ping_time"].values,
                        dtype="datetime64[ns]")
        assert np.array_equal(s.times, pt)
        assert s.max_count == ed["Sonar/Beam_group1"].sizes["range_sample"]
        assert s.n_channels == ed["Sonar/Beam_group1"].sizes["channel"]
        assert 0 < s.max_interval < 1 and 1000 < s.max_sound_velocity < 2000

    def test_corrupt_file_falls_back_to_eager(self, tmp_path):
        """Trailing garbage breaks the strict seek-scan; the runner must fall
        back to the eager path (whose full scan resyncs) and still answer."""
        from echopype_tpu.parallel import run_survey_mvbs_from_raw

        files = self._files(tmp_path, n_files=2)
        with open(files[1], "ab") as f:
            f.write(b"\x99" * 37)  # not a valid frame
        kw = dict(sonar_model="EK60", range_bin_m=7.0, ping_time_bin="15s")
        m = run_survey_mvbs_from_raw(files, **kw)
        got = np.asarray(m["Sv"].values)
        assert np.isfinite(got).any()
        # and equals the explicit eager run
        m_e = run_survey_mvbs_from_raw(files, prefetch=False, **kw)
        np.testing.assert_array_equal(got, np.asarray(m_e["Sv"].values))


class TestProcessPoolIngest:
    """workers=N decodes files in worker processes; bins must be identical
    to the in-process path (VERDICT r2 item 7)."""

    def test_pool_matches_serial(self, tmp_path):
        import numpy as _np

        from echopype_tpu.parallel import run_survey_mvbs_from_raw
        from synth_ek60 import write_ek60_raw as _w

        files = []
        for i in range(3):
            f = tmp_path / f"PL{i}-D20200101-T00{i}000.raw"
            _w(f, n_pings=20, n_samples=80,
               t0=_np.datetime64("2020-01-01T00:00:00", "ns") + _np.timedelta64(i * 30, "s"))
            files.append(f)
        kw = dict(sonar_model="EK60", range_bin_m=10.0, ping_time_bin="10s",
                  chunk_pings=16, prefetch=False)
        serial = run_survey_mvbs_from_raw(files, workers=0, **kw)
        pooled = run_survey_mvbs_from_raw(files, workers=2, **kw)
        _np.testing.assert_allclose(
            pooled["Sv"].values, serial["Sv"].values, rtol=0, atol=0, equal_nan=True
        )
