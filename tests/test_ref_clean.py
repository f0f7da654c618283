"""Reference-differential parity for the clean subsystem.

The reference's noise-removal functions execute on our datasets through the
xarray facade + the numpy flox / dask_image shims (xrlite/flox_compat.py):
``pool_Sv`` (triple loop), ``downsample_upsample_along_depth`` (flox binning +
reindex-ffill), ``index_binning_pool_Sv`` (generic_filter), the echopy mask
kernels, the background-noise estimator (coarsen + reindex), and the
fielding/matecho transient detectors.  Our device kernels and vectorized host
paths must match mask-for-mask (reference: echopype/clean/api.py, clean/utils.py,
clean/transient_noise/*).
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import load_ref
from test_ref_postprocess import make_sv_ds


def make_clean_ds(n_ch=2, n_ping=14, n_r=24, seed=0, uniform=True, range_var="depth"):
    """Sv dataset with a depth variable (uniform or per-ping-perturbed grid)."""
    ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
    rng = np.random.default_rng(seed + 100)
    base = np.broadcast_to(np.arange(n_r) * 2.0 + 1.0, (n_ch, n_ping, n_r)).copy()
    if not uniform:
        base = base + rng.uniform(0, 0.3, (n_ch, n_ping, 1))
    ds[range_var] = (("channel", "ping_time", "range_sample"), base)
    return ds


class TestTransientNoiseDifferential:
    @pytest.mark.parametrize("uniform", [True, False])
    def test_pool_sv_mask_matches(self, uniform):
        ds = make_clean_ds(n_ch=2, n_ping=12, n_r=18, seed=1, uniform=uniform)
        ref_api = load_ref("clean/api")
        want = ref_api.mask_transient_noise(
            ds,
            func="nanmean",
            depth_bin="6m",
            num_side_pings=3,
            exclude_above="3.0m",
            transient_noise_threshold="6.0dB",
            range_var="depth",
        )
        got = ep.clean.mask_transient_noise(
            ds,
            func="nanmean",
            depth_bin="6m",
            num_side_pings=3,
            exclude_above="3.0m",
            transient_noise_threshold="6.0dB",
            range_var="depth",
        )
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )

    def test_index_binning_pool_matches(self):
        ds = make_clean_ds(n_ch=2, n_ping=16, n_r=20, seed=2, uniform=True)
        ref_api = load_ref("clean/api")
        kw = dict(
            func="nanmean",
            depth_bin="5m",
            num_side_pings=2,
            exclude_above="3.0m",
            transient_noise_threshold="6.0dB",
            range_var="depth",
            use_index_binning=True,
        )
        want = ref_api.mask_transient_noise(ds, **kw)
        got = ep.clean.mask_transient_noise(ds, **kw)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )


class TestImpulseNoiseDifferential:
    @pytest.mark.parametrize("uniform", [True, False])
    def test_impulse_mask_matches(self, uniform):
        ds = make_clean_ds(n_ch=2, n_ping=15, n_r=22, seed=3, uniform=uniform)
        # plant impulse spikes
        sv = np.asarray(ds["Sv"].values)
        sv[0, 7, :] += 30.0
        sv[1, 10, 5:12] += 25.0
        ref_api = load_ref("clean/api")
        kw = dict(depth_bin="4m", num_side_pings=2, impulse_noise_threshold="10.0dB",
                  range_var="depth")
        want = ref_api.mask_impulse_noise(ds, **kw)
        got = ep.clean.mask_impulse_noise(ds, **kw)
        # reference returns (channel, range_sample, ping_time) via apply_ufunc
        want = want.transpose(*got.dims)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool),
            np.asarray(want.values, dtype=bool),
        )


class TestAttenuatedSignalDifferential:
    @pytest.mark.parametrize("uniform", [True, False])
    def test_attenuated_mask_matches(self, uniform):
        ds = make_clean_ds(n_ch=2, n_ping=20, n_r=30, seed=4, uniform=uniform)
        # attenuate a run of pings inside the scattering layer
        sv = np.asarray(ds["Sv"].values)
        sv[0, 8:12, 10:25] -= 25.0
        ref_api = load_ref("clean/api")
        kw = dict(
            upper_limit_sl="20.0m",
            lower_limit_sl="50.0m",
            num_side_pings=3,
            attenuation_signal_threshold="5.0dB",
            range_var="depth",
        )
        want = ref_api.mask_attenuated_signal(ds, **kw)
        got = ep.clean.mask_attenuated_signal(ds, **kw)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool),
            np.asarray(want.values, dtype=bool),
        )

    def test_out_of_range_limits_empty_mask(self):
        ds = make_clean_ds(n_ch=2, n_ping=8, n_r=10, seed=5)
        ref_api = load_ref("clean/api")
        kw = dict(upper_limit_sl="400.0m", lower_limit_sl="500.0m",
                  num_side_pings=2, attenuation_signal_threshold="8.0dB",
                  range_var="depth")
        want = ref_api.mask_attenuated_signal(ds, **kw)
        got = ep.clean.mask_attenuated_signal(ds, **kw)
        assert not np.asarray(want.values).any()
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )


class TestBackgroundNoiseDifferential:
    def _noise_ds(self, seed=6, n_ch=2, n_ping=21, n_r=33):
        ds = make_clean_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
        ds["sound_absorption"] = (
            ("channel",),
            np.array([0.0024, 0.0101][:n_ch]),
        )
        return ds

    def test_estimate_background_noise_matches(self):
        ds = self._noise_ds()
        ref_api = load_ref("clean/api")
        want = ref_api.estimate_background_noise(ds, ping_num=4, range_sample_num=7)
        got = ep.clean.estimate_background_noise(ds, ping_num=4, range_sample_num=7)
        np.testing.assert_allclose(
            np.asarray(got.values, dtype="f8"),
            np.asarray(want.values, dtype="f8"),
            rtol=1e-12,
        )

    def test_estimate_with_noise_max(self):
        ds = self._noise_ds(seed=7)
        ref_api = load_ref("clean/api")
        want = ref_api.estimate_background_noise(
            ds, ping_num=5, range_sample_num=6, background_noise_max="-80.0dB"
        )
        got = ep.clean.estimate_background_noise(
            ds, ping_num=5, range_sample_num=6, background_noise_max="-80.0dB"
        )
        np.testing.assert_allclose(
            np.asarray(got.values, dtype="f8"),
            np.asarray(want.values, dtype="f8"),
            rtol=1e-12,
        )

    def test_remove_background_noise_matches(self):
        ds = self._noise_ds(seed=8)
        ref_api = load_ref("clean/api")
        want = ref_api.remove_background_noise(
            ds.copy(), ping_num=4, range_sample_num=5, SNR_threshold="3.0dB"
        )
        got = ep.clean.remove_background_noise(
            ds, ping_num=4, range_sample_num=5, SNR_threshold="3.0dB"
        )
        for var in ("Sv_noise", "Sv_corrected"):
            w = np.asarray(want[var].values, dtype="f8")
            g = np.asarray(got[var].values, dtype="f8")
            np.testing.assert_array_equal(np.isnan(g), np.isnan(w))
            m = ~np.isnan(w)
            np.testing.assert_allclose(g[m], w[m], rtol=1e-12)


class TestTransientDetectorsDifferential:
    def _deep_ds(self, seed=9, n_ch=2, n_ping=40, n_r=60):
        """Deep survey: depth down to ~1200 m so fielding's window applies."""
        ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
        depth = np.broadcast_to(
            np.arange(n_r) * 20.0 + 10.0, (n_ch, n_ping, n_r)
        ).copy()
        ds["depth"] = (("channel", "ping_time", "range_sample"), depth)
        sv = np.asarray(ds["Sv"].values)
        sv -= 10.0  # quieter baseline so maxts gate passes
        sv[0, 12:15, 40:] += 28.0  # deep transient
        sv[1, 25, 30:] += 35.0
        return ds

    def test_fielding_matches_reference(self):
        ds = self._deep_ds()
        ref_f = load_ref("clean/transient_noise/transient_fielding")
        want = ref_f.transient_noise_fielding(
            ds, var_name="Sv", range_var="depth", r0=900, r1=1100, n=5,
            thr=(6, 3), roff=20, jumps=100, maxts=-55, start=0,
        )
        got = ep.clean.detect_transient(
            ds, method="fielding",
            params=dict(var_name="Sv", range_var="depth", r0=900, r1=1100, n=5,
                        thr=(6, 3), roff=20, jumps=100, maxts=-55, start=0),
        )
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )

    def test_matecho_matches_reference(self):
        ds = self._deep_ds(seed=10)
        ref_m = load_ref("clean/transient_noise/transient_matecho")
        params = dict(
            var_name="Sv", range_var="depth", time_var="ping_time",
            start_depth=200.0, window_meter=600.0, window_ping=8,
            percentile=25, delta_db=10.0, extend_ping=1, min_window=5.0,
        )
        want = ref_m.transient_noise_matecho(ds, **params)
        got = ep.clean.detect_transient(ds, method="matecho", params=params)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )


class TestExactBoundaryMembershipDifferential:
    """depth_bin equal to the grid spacing puts window members EXACTLY on
    d +- bin, where the reference's float64 edge arithmetic decides
    membership (e.g. 3.2 - 2.0 > 1.2 in f64).  The grid path resolves
    membership on host in f64 (grid_window_members) and the ping-varying
    path runs host-exact, so the masks must match the reference cell for
    cell — this pinned the round-4 soak's 67-cell transient mismatches."""

    @pytest.mark.parametrize("uniform", [True, False])
    def test_transient_mask_exact_at_boundaries(self, uniform):
        ds = make_clean_ds(n_ch=3, n_ping=26, n_r=27, seed=411046184, uniform=uniform)
        sv = np.asarray(ds["Sv"].values)
        rng = np.random.default_rng(99)
        sv[rng.random(sv.shape) < 0.1] = np.nan
        ref_api = load_ref("clean/api")
        kw = dict(func="nanmean", depth_bin="2.0m", num_side_pings=1,
                  exclude_above="3.0m", transient_noise_threshold="6.0dB",
                  range_var="depth")
        want = ref_api.mask_transient_noise(ds, **kw)
        got = ep.clean.mask_transient_noise(ds, **kw)
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )

    def test_pooled_values_match_reference_f64(self):
        # the pooled mean itself (not just the mask) matches the reference
        # to f64 precision on the ping-varying path
        ds = make_clean_ds(n_ch=2, n_ping=10, n_r=14, seed=7, uniform=False)
        ref_utils = load_ref("clean/utils")
        want = ref_utils.pool_Sv(ds, np.nanmean, 2.0, 1, 3.0, "depth")
        from echopype_tpu.clean.utils import pool_Sv_nanmean

        got = pool_Sv_nanmean(
            np.asarray(ds["Sv"].values, "f8"),
            np.asarray(ds["depth"].values, "f8"), 2.0, 1, 3.0,
        )
        w = np.asarray(want.values, dtype="f8")
        np.testing.assert_array_equal(np.isnan(got), np.isnan(w))
        m = ~np.isnan(w)
        np.testing.assert_allclose(got[m], w[m], rtol=0, atol=1e-12)


class TestAttenuatedLimitStringCompareQuirk:
    def test_reference_string_compare_raises_ours_accepts(self):
        """Inverted finding: the reference compares the limit STRINGS before
        parsing (clean/api.py:320), so numerically valid pairs whose string
        order inverts ("5.0m" > "15.0m" lexicographically) raise; we compare
        parsed meters and accept them."""
        ds = make_clean_ds(n_ch=1, n_ping=12, n_r=30, seed=8)
        ref_api = load_ref("clean/api")
        kw = dict(upper_limit_sl="5.0m", lower_limit_sl="15.0m",
                  num_side_pings=2, attenuation_signal_threshold="6.0dB",
                  range_var="depth")
        with pytest.raises(ValueError, match="shorter than maximum"):
            ref_api.mask_attenuated_signal(ds, **kw)
        got = ep.clean.mask_attenuated_signal(ds, **kw)  # numerically valid
        assert np.asarray(got.values).dtype == bool

    def test_numerically_invalid_pair_raises_like_reference(self):
        ds = make_clean_ds(n_ch=1, n_ping=12, n_r=30, seed=8)
        ref_api = load_ref("clean/api")
        kw = dict(upper_limit_sl="50.0m", lower_limit_sl="40.0m",
                  num_side_pings=2, attenuation_signal_threshold="6.0dB",
                  range_var="depth")
        with pytest.raises(ValueError, match="shorter than maximum"):
            ref_api.mask_attenuated_signal(ds, **kw)
        with pytest.raises(ValueError, match="shorter than maximum"):
            ep.clean.mask_attenuated_signal(ds, **kw)


class TestAttenuatedNaNHoleArgminQuirk:
    def test_nan_holed_grid_no_masking_like_reference(self):
        """The reference's np.argmin treats NaN as the minimum, so a
        NaN-holed depth row resolves both scattering-layer bounds to the
        first NaN index — empty slab, no masking ever (clean/utils.py:349).
        Faithful quirk: our slab bounds use plain argmin too."""
        ds = make_clean_ds(n_ch=2, n_ping=20, n_r=30, seed=4)
        dep = np.asarray(ds["depth"].values)
        dep[..., 5] = np.nan  # interior hole
        ref_api = load_ref("clean/api")
        kw = dict(upper_limit_sl="20.0m", lower_limit_sl="50.0m",
                  num_side_pings=3, attenuation_signal_threshold="5.0dB",
                  range_var="depth")
        want = ref_api.mask_attenuated_signal(ds, **kw)
        got = ep.clean.mask_attenuated_signal(ds, **kw)
        assert not np.asarray(want.values).any()
        np.testing.assert_array_equal(
            np.asarray(got.values, dtype=bool), np.asarray(want.values, dtype=bool)
        )
