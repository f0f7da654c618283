"""Noise-mask fusion in the survey streamers (sharded clean story).

``run_survey_mvbs``/``run_survey_nasc`` accept ``noise_masks`` and must be
bin-exact with the reference composition applied file-by-file:
clean.mask_* -> apply_mask (NaN) -> compute_X (reference: clean/api.py:30-359,
mask/api.py:467-675, commongrid) — on one device and on an 8-device mesh.
"""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.parallel.survey import run_survey_mvbs, run_survey_nasc
from echopype_tpu.xrlite import Dataset

from test_ref_commongrid import make_nasc_ds

MASK_SPEC = {
    "impulse": dict(
        depth_bin="4m", num_side_pings=2, impulse_noise_threshold="10.0dB",
        range_var="depth",
    ),
    "transient": dict(
        func="nanmean", depth_bin="6m", num_side_pings=3,
        exclude_above="3.0m", transient_noise_threshold="8.0dB",
        range_var="depth",
    ),
    "attenuated": dict(
        upper_limit_sl="10.0m", lower_limit_sl="30.0m", num_side_pings=3,
        attenuation_signal_threshold="5.0dB", range_var="depth",
    ),
}


def _survey_files(n_files=2, n_ping=36, n_ch=2, n_r=30):
    """Chronologically ordered Sv datasets with depth + lat/lon + noise."""
    files = []
    for i in range(n_files):
        ds = make_nasc_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=50 + i)
        pt = np.asarray(ds.coords["ping_time"].values) + np.timedelta64(
            i * (n_ping + 5), "s"
        )
        ds.coords["ping_time"].values = pt
        sv = np.asarray(ds["Sv"].values)
        sv[0, 7 + i, :] += 30.0  # impulse ping
        sv[1, 14:17, 10:] += 20.0  # transient blob
        sv[0, 20:24, 5:15] -= 25.0  # attenuated run
        files.append(ds)
    return files


def _masked_copy(ds, spec):
    """Reference composition: OR of clean masks -> NaN -> new dataset."""
    flagged = None
    fns = {
        "impulse": ep.clean.mask_impulse_noise,
        "transient": ep.clean.mask_transient_noise,
        "attenuated": ep.clean.mask_attenuated_signal,
    }
    for kind, params in spec.items():
        m = np.asarray(fns[kind](ds, **params).values, dtype=bool)
        flagged = m if flagged is None else (flagged | m)
    out = ds.copy()
    out["Sv"] = (ds["Sv"].dims, np.where(flagged, np.nan, np.asarray(ds["Sv"].values)))
    return out


class TestCleanedMVBSStreaming:
    def test_fused_equals_composed(self):
        files = _survey_files()
        fused = run_survey_mvbs(
            files, range_bin_m=5.0, ping_time_bin="6s", noise_masks=MASK_SPEC
        )
        composed = run_survey_mvbs(
            [_masked_copy(ds, MASK_SPEC) for ds in files],
            range_bin_m=5.0,
            ping_time_bin="6s",
        )
        f = np.asarray(fused["Sv"].values, dtype="f8")
        c = np.asarray(composed["Sv"].values, dtype="f8")
        assert np.isnan(f).sum() > 0  # masks actually removed samples
        np.testing.assert_array_equal(np.isnan(f), np.isnan(c))
        np.testing.assert_array_equal(f, c)

    def test_masks_change_result(self):
        files = _survey_files()
        plain = run_survey_mvbs(files, range_bin_m=5.0, ping_time_bin="6s")
        fused = run_survey_mvbs(
            files, range_bin_m=5.0, ping_time_bin="6s", noise_masks=MASK_SPEC
        )
        p = np.asarray(plain["Sv"].values)
        f = np.asarray(fused["Sv"].values)
        assert not np.array_equal(p, f, equal_nan=True)

    def test_mesh_matches_single_device(self):
        import jax
        from echopype_tpu.parallel import make_mesh

        files = _survey_files()
        mesh = make_mesh(len(jax.devices()))
        single = run_survey_mvbs(
            files, range_bin_m=5.0, ping_time_bin="6s", noise_masks=MASK_SPEC
        )
        sharded = run_survey_mvbs(
            files, range_bin_m=5.0, ping_time_bin="6s", noise_masks=MASK_SPEC,
            mesh=mesh,
        )
        s = np.asarray(single["Sv"].values, dtype="f8")
        m = np.asarray(sharded["Sv"].values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(s), np.isnan(m))
        both = ~np.isnan(s)
        np.testing.assert_allclose(m[both], s[both], atol=1e-5, rtol=0)

    def test_unknown_mask_kind_raises(self):
        files = _survey_files(n_files=1)
        with pytest.raises(ValueError, match="unknown noise mask"):
            run_survey_mvbs(files, noise_masks={"bogus": {}})


class TestCleanedNASCStreaming:
    def test_fused_equals_composed(self):
        files = _survey_files()
        fused = run_survey_nasc(
            files, range_bin="5m", dist_bin="0.05nmi", noise_masks=MASK_SPEC
        )
        composed = run_survey_nasc(
            [_masked_copy(ds, MASK_SPEC) for ds in files],
            range_bin="5m",
            dist_bin="0.05nmi",
        )
        f = np.asarray(fused["NASC"].values, dtype="f8")
        c = np.asarray(composed["NASC"].values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(f), np.isnan(c))
        both = ~np.isnan(f)
        np.testing.assert_array_equal(f[both], c[both])


class TestFromRawNoiseMasks:
    """noise_masks on RAW->MVBS streaming (round-4 closure of the
    survey.py:811 NotImplementedError): the streamer runs two-pass
    internally — full-file Sv -> clean masks -> chunked binning — and must
    be bin-exact with the composed reference chain per file."""

    RAW_SPEC = {
        "impulse": dict(
            depth_bin="4m", num_side_pings=2, impulse_noise_threshold="10.0dB",
            range_var="echo_range",
        ),
        "attenuated": dict(
            upper_limit_sl="10.0m", lower_limit_sl="30.0m", num_side_pings=3,
            attenuation_signal_threshold="5.0dB", range_var="echo_range",
        ),
    }

    def _files(self, tmp_path, n=2):
        from synth_ek60 import write_ek60_raw

        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        files = []
        for i in range(n):
            raw = tmp_path / f"NM{i}-D20200101-T000000.raw"
            write_ek60_raw(raw, n_pings=24, n_samples=60, seed=10 + i,
                           t0=t0 + np.timedelta64(30 * i, "s"))
            files.append(str(raw))
        return files

    def test_from_raw_equals_composed(self, tmp_path):
        from echopype_tpu.parallel.survey import (
            run_survey_mvbs,
            run_survey_mvbs_from_raw,
        )

        files = self._files(tmp_path)
        kw = dict(range_bin_m=5.0, ping_time_bin="10s", chunk_pings=8)
        streamed = run_survey_mvbs_from_raw(
            files, sonar_model="EK60", noise_masks=self.RAW_SPEC, **kw
        )
        # composed chain: per-file compute_Sv -> clean masks -> store stream
        sv_files = [
            ep.calibrate.compute_Sv(ep.open_raw(f, sonar_model="EK60"))
            for f in files
        ]
        masked = [_masked_copy(ds, self.RAW_SPEC) for ds in sv_files]
        composed = run_survey_mvbs(masked, **kw)
        np.testing.assert_allclose(
            np.asarray(streamed["Sv"].values),
            np.asarray(composed["Sv"].values),
            rtol=0, atol=1e-5, equal_nan=True,
        )

    def test_from_raw_masks_change_result(self, tmp_path):
        from echopype_tpu.parallel.survey import run_survey_mvbs_from_raw

        files = self._files(tmp_path, n=1)
        kw = dict(range_bin_m=5.0, ping_time_bin="10s", chunk_pings=8)
        plain = run_survey_mvbs_from_raw(files, sonar_model="EK60", **kw)
        masked = run_survey_mvbs_from_raw(
            files, sonar_model="EK60", noise_masks=self.RAW_SPEC, **kw
        )
        a, b = np.asarray(plain["Sv"].values), np.asarray(masked["Sv"].values)
        assert a.shape == b.shape
        assert not np.array_equal(np.nan_to_num(a), np.nan_to_num(b))
