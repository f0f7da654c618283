"""Reference-differential parity for seafloor and shoal detectors.

The reference's bottom_basic / bottom_blackwell (mask/seafloor_detection/) and
shoal_echoview / shoal_weill (mask/shoal_detection/) execute on our datasets
through the xarray facade; our detectors must match line-for-line / mask-for-
mask.
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import load_ref
from test_ref_postprocess import make_sv_ds


def make_bottom_ds(n_ch=2, n_ping=25, n_r=80, bottom_idx=55, seed=17):
    """Quiet water column with a strong seafloor echo at ``bottom_idx``."""
    ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
    rng = np.random.default_rng(seed)
    sv = np.asarray(ds["Sv"].values)
    sv[:] = rng.normal(-85.0, 3.0, sv.shape)
    # per-ping bottom wobble +-3 samples
    wob = rng.integers(-3, 4, n_ping)
    for p in range(n_ping):
        b = bottom_idx + wob[p]
        sv[:, p, b : b + 6] = rng.normal(-25.0, 2.0, (n_ch, 6))
    depth = np.broadcast_to(np.arange(n_r) * 0.5 + 1.0, sv.shape).copy()
    ds["depth"] = (("channel", "ping_time", "range_sample"), depth)
    return ds


class TestSeafloorDifferential:
    def test_bottom_basic_matches(self):
        ds = make_bottom_ds()
        ref_b = load_ref("mask/seafloor_detection/bottom_basic")
        kw = dict(var_name="Sv", channel="ch0", threshold=(-40.0, -10.0),
                  offset_m=0.5, bin_skip_from_surface=10)
        want = ref_b.bottom_basic(ds, **kw)
        got = ep.mask.detect_seafloor(ds, method="basic", params=kw)
        np.testing.assert_allclose(
            np.asarray(got.values, dtype="f8"),
            np.asarray(want.values, dtype="f8"),
            rtol=0, atol=0, equal_nan=True,
        )

    def test_bottom_basic_scalar_threshold(self):
        ds = make_bottom_ds(seed=19)
        ref_b = load_ref("mask/seafloor_detection/bottom_basic")
        kw = dict(var_name="Sv", channel="ch1", threshold=-40.0,
                  offset_m=0.2, bin_skip_from_surface=5)
        want = ref_b.bottom_basic(ds, **kw)
        got = ep.mask.detect_seafloor(ds, method="basic", params=kw)
        np.testing.assert_allclose(
            np.asarray(got.values, dtype="f8"),
            np.asarray(want.values, dtype="f8"),
            rtol=0, atol=0, equal_nan=True,
        )

    def test_bottom_blackwell_matches(self):
        ds = make_bottom_ds(n_ping=30, n_r=70, bottom_idx=45, seed=23)
        rng = np.random.default_rng(23)
        sv = np.asarray(ds["Sv"].values)
        # angles: noisy everywhere, structured (large) at/below the seafloor
        th = rng.normal(0.0, 2.0, sv.shape)
        ph = rng.normal(0.0, 2.0, sv.shape)
        th[:, :, 45:] += 14.0
        ph[:, :, 45:] += 14.0
        ds["angle_alongship"] = (("channel", "ping_time", "range_sample"), th)
        ds["angle_athwartship"] = (("channel", "ping_time", "range_sample"), ph)
        ref_b = load_ref("mask/seafloor_detection/bottom_blackwell")
        kw = dict(var_name="Sv", channel="ch0", threshold=(-60.0, 40.0, 40.0),
                  offset=0.3, r0=2.0, r1=40.0, wtheta=5, wphi=7)
        want = ref_b.bottom_blackwell(ds, **kw)
        got = ep.mask.detect_seafloor(ds, method="blackwell", params=kw)
        w = np.asarray(want.values, dtype="f8")
        g = np.asarray(got.values, dtype="f8")
        assert np.isfinite(w).any(), "oracle found no bottom - test data too weak"
        np.testing.assert_allclose(g, w, rtol=0, atol=0, equal_nan=True)


def make_shoal_ds(n_ch=2, n_ping=40, n_r=50, seed=29):
    """Quiet background with two dense shoal blobs and one speck."""
    ds = make_sv_ds(n_ch=n_ch, n_ping=n_ping, n_r=n_r, seed=seed)
    rng = np.random.default_rng(seed)
    sv = np.asarray(ds["Sv"].values)
    sv[:] = rng.normal(-88.0, 2.0, sv.shape)
    sv[:, 5:14, 10:18] = rng.normal(-55.0, 2.0, (n_ch, 9, 8))   # big shoal
    sv[:, 22:30, 30:37] = rng.normal(-58.0, 2.0, (n_ch, 8, 7))  # second shoal
    sv[:, 35, 44] = -50.0                                       # 1-px speck
    return ds


class TestShoalDifferential:
    def test_shoal_weill_matches(self):
        ds = make_shoal_ds()
        ref_w = load_ref("mask/shoal_detection/shoal_weill")
        kw = dict(var_name="Sv", channel="ch0", thr=-70.0,
                  maxvgap=2, maxhgap=1, minvlen=3, minhlen=3)
        want = ref_w.shoal_weill(ds, **kw)
        got = ep.mask.detect_shoal(ds, method="weill", params=kw)
        w = np.asarray(want.values, dtype=bool)
        g = np.asarray(got.values, dtype=bool)
        assert w.any(), "oracle found no shoal - test data too weak"
        if g.shape != w.shape:
            want = want.transpose(*got.dims)
            w = np.asarray(want.values, dtype=bool)
        np.testing.assert_array_equal(g, w)

    def test_shoal_echoview_matches(self):
        ds = make_shoal_ds(seed=31)
        ref_e = load_ref("mask/shoal_detection/shoal_echoview")
        idim = np.arange(ds.sizes["range_sample"]) * 0.5  # meters
        jdim = np.arange(ds.sizes["ping_time"]) * 1.0     # ping units
        kw = dict(var_name="Sv", channel="ch0", idim=idim, jdim=jdim,
                  thr=-70.0, mincan=(1.0, 2.0), maxlink=(2.0, 3.0),
                  minsho=(2.0, 3.0))
        want = ref_e.shoal_echoview(ds, **kw)
        got = ep.mask.detect_shoal(ds, method="echoview", params=kw)
        w = np.asarray(want.values, dtype=bool)
        g = np.asarray(got.values, dtype=bool)
        assert w.any(), "oracle found no shoal - test data too weak"
        if g.shape != w.shape:
            want = want.transpose(*got.dims)
            w = np.asarray(want.values, dtype=bool)
        np.testing.assert_array_equal(g, w)
