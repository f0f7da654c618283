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


def test_from_raw_noise_masks_clear_error():
    from echopype_tpu.parallel.survey import run_survey_mvbs_from_raw

    with pytest.raises(NotImplementedError, match="noise_masks"):
        run_survey_mvbs_from_raw(["whatever.raw"], noise_masks={"impulse": {}})
