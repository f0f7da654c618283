"""EnvParams differential: the reference's calibrate/env_params_old.py
executes on the facade as the oracle.

The REAL reference module (env_params_old.py:18-205) is loaded through the
xrlite xarray facade and its ``EnvParams._apply`` runs on the same Platform /
Beam groups our implementation consumes; every (data_kind, interp_method,
extrap_method) combination supported by the reference is compared
value-for-value, plus error-message parity and the calibrate-entry type
check (calibrate_base.py:35-47).

Note this closes the last SURVEY §2 row that round 3 sanctioned as a skip:
``EnvParams`` is dead code in the reference's production paths (its
``_apply`` has no callers and ``compute_Sv`` rejects the object), but the
class itself is public surface a migrating user may hold data in, so we
implement and differential-test it anyway.
"""

import numpy as np
import pytest

from echopype_tpu.calibrate.env_params_old import EnvParams, VALID_INTERP_METHODS
from echopype_tpu.xrlite import Dataset

from ref_oracle import FakeEchoData, load_ref


def _t(seconds):
    base = np.datetime64("2020-01-01T00:00:00", "ns")
    return base + np.asarray(seconds, dtype="i8") * 1_000_000_000


def _env_stationary():
    """A fixed CTD: 6 samples over t=100..200 s, no NaNs (real CTD output)."""
    return Dataset(
        data_vars={
            "temperature": ("time3", np.array([10.0, 10.5, 11.2, 10.9, 11.8, 12.0])),
            "salinity": ("time3", np.array([33.0, 33.2, 33.1, 33.4, 33.3, 33.5])),
            "pressure": ("time3", np.array([50.0, 51.0, 49.5, 50.5, 51.5, 52.0])),
        },
        coords={"time3": _t([100, 120, 140, 160, 180, 200])},
    )


def _ed_stationary():
    """Platform time3 straddling the env range: points below, inside (incl.
    exact grid hits and duplicates — the reference's np.unique/isel passes,
    env_params_old.py:147,153), and above."""
    t3 = _t([60, 90, 110, 120, 133, 133, 171, 199, 220, 260])
    return FakeEchoData({"Platform": Dataset(coords={"time3": t3})}, "EK60")


def _env_mobile(rng):
    n = 30
    lat = 32.0 + rng.uniform(0, 1.0, n)
    lon = -117.0 + rng.uniform(0, 1.0, n)
    return Dataset(
        data_vars={
            "temperature": ("points", 10.0 + 2.0 * rng.standard_normal(n)),
            "salinity": ("points", 33.0 + 0.5 * rng.standard_normal(n)),
            "pressure": ("points", 50.0 + 5.0 * rng.standard_normal(n)),
        },
        coords={
            "latitude": ("points", lat),
            "longitude": ("points", lon),
        },
    )


def _ed_mobile(all_nat_time1=False, out_of_range_ping=True):
    """A ship track crossing the scattered env cloud, optionally with one
    ping_time outside the time1 range (NaN track position -> NaN griddata
    output for linear/cubic; scipy's nearest kd-tree rejects NaN query
    points, so the nearest differential keeps pings in range)."""
    t1 = _t([0, 50, 100, 150, 200])
    if all_nat_time1:
        t1 = np.full(5, np.datetime64("NaT"), dtype="datetime64[ns]")
    lat = np.array([32.2, 32.4, 32.5, 32.6, 32.8])
    lon = np.array([-116.8, -116.6, -116.5, -116.4, -116.2])
    platform = Dataset(
        data_vars={
            "latitude": ("time1", lat),
            "longitude": ("time1", lon),
        },
        coords={"time1": t1},
    )
    ping_time = _t([10, 60, 110, 160, 240 if out_of_range_ping else 190])
    beam = Dataset(coords={"ping_time": ping_time})
    return FakeEchoData(
        {"Platform": platform, "Sonar/Beam_group1": beam}, "EK60"
    )


def _compare(ref_out, our_out):
    assert set(ref_out) == set(our_out) == {"temperature", "salinity", "pressure"}
    for var in ref_out:
        r, o = ref_out[var], our_out[var]
        assert tuple(r.dims) == tuple(o.dims) == ("time1",)
        rv = np.asarray(r.values, dtype="f8")
        ov = np.asarray(o.values, dtype="f8")
        assert rv.shape == ov.shape
        np.testing.assert_allclose(ov, rv, rtol=0, atol=1e-12, equal_nan=True)
        rc = np.asarray(r["time1"].values)
        oc = np.asarray(o.coords["time1"].values)
        assert np.array_equal(rc, oc)


class TestStationaryDifferential:
    @pytest.mark.parametrize(
        "interp_method,extrap_method",
        [
            ("linear", "linear"),
            ("linear", "nearest"),
            ("nearest", "linear"),
            ("nearest", "nearest"),
            ("zero", "linear"),
            ("slinear", "nearest"),
            ("quadratic", "linear"),
            ("cubic", "nearest"),
        ],
    )
    def test_apply_matches_reference(self, interp_method, extrap_method):
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_stationary()
        kw = dict(
            data_kind="stationary",
            interp_method=interp_method,
            extrap_method=extrap_method,
        )
        ref_out = ref_mod.EnvParams(env, **kw)._apply(_ed_stationary())
        our_out = EnvParams(env, **kw)._apply(_ed_stationary())
        _compare(ref_out, our_out)

    def test_missing_dim_error_parity(self):
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_stationary()
        bad = FakeEchoData({"Platform": Dataset(coords={"time2": _t([0])})}, "EK60")
        with pytest.raises(ValueError) as ref_err:
            ref_mod.EnvParams(env, "stationary")._apply(bad)
        with pytest.raises(ValueError) as our_err:
            EnvParams(env, "stationary")._apply(bad)
        assert str(our_err.value) == str(ref_err.value)
        assert "missing dimension time3" in str(our_err.value)

    def test_invalid_interp_method_parity(self):
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_stationary()
        with pytest.raises(ValueError) as ref_err:
            ref_mod.EnvParams(env, "mobile", interp_method="quadratic")
        with pytest.raises(ValueError) as our_err:
            EnvParams(env, "mobile", interp_method="quadratic")
        assert str(our_err.value) == str(ref_err.value)
        assert VALID_INTERP_METHODS == ref_mod.VALID_INTERP_METHODS


class TestMobileDifferential:
    @pytest.mark.parametrize("interp_method", ["linear", "nearest", "cubic"])
    def test_apply_matches_reference(self, interp_method):
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_mobile(np.random.default_rng(7))
        kw = dict(data_kind="mobile", interp_method=interp_method)
        oor = interp_method != "nearest"
        ref_out = ref_mod.EnvParams(env, **kw)._apply(_ed_mobile(out_of_range_ping=oor))
        our_out = EnvParams(env, **kw)._apply(_ed_mobile(out_of_range_ping=oor))
        _compare(ref_out, our_out)

    def test_unsorted_time1_matches_reference(self):
        # real NMEA streams can carry out-of-order time1 rows; the reference
        # delegates to scipy interp1d (assume_sorted=False sorts) — our
        # linear fast path must sort too, not trust np.interp on unsorted x
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_mobile(np.random.default_rng(7))
        kw = dict(data_kind="mobile", interp_method="linear")
        perm = np.array([2, 0, 4, 1, 3])

        def shuffled_ed():
            ed = _ed_mobile(out_of_range_ping=True)
            plat = ed["Platform"]
            return FakeEchoData(
                {
                    "Platform": Dataset(
                        data_vars={
                            "latitude": ("time1", np.asarray(plat["latitude"].values)[perm]),
                            "longitude": ("time1", np.asarray(plat["longitude"].values)[perm]),
                        },
                        coords={"time1": np.asarray(plat["time1"].values)[perm]},
                    ),
                    "Sonar/Beam_group1": ed["Sonar/Beam_group1"],
                },
                "EK60",
            )

        ref_out = ref_mod.EnvParams(env, **kw)._apply(shuffled_ed())
        our_out = EnvParams(env, **kw)._apply(shuffled_ed())
        _compare(ref_out, our_out)

    def test_nearest_nan_track_raises_parity(self):
        """scipy's NearestNDInterpolator kd-tree rejects NaN query points;
        an out-of-track ping therefore raises identically in both."""
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_mobile(np.random.default_rng(7))
        with pytest.raises(ValueError, match="must be finite"):
            ref_mod.EnvParams(env, "mobile", interp_method="nearest")._apply(_ed_mobile())
        with pytest.raises(ValueError, match="must be finite"):
            EnvParams(env, "mobile", interp_method="nearest")._apply(_ed_mobile())

    def test_all_nat_time1_error_parity(self):
        ref_mod = load_ref("calibrate/env_params_old")
        env = _env_mobile(np.random.default_rng(7))
        ed = _ed_mobile(all_nat_time1=True)
        with pytest.raises(ValueError) as ref_err:
            ref_mod.EnvParams(env, "mobile")._apply(ed)
        with pytest.raises(ValueError) as our_err:
            EnvParams(env, "mobile")._apply(ed)
        assert str(our_err.value) == str(ref_err.value)
        assert "without time1" in str(our_err.value)


class TestCalibrateEntryTypeCheck:
    """compute_Sv accepts only None | dict (calibrate_base.py:35-47); an
    EnvParams object must be applied explicitly via ``_apply``."""

    def test_compute_sv_rejects_envparams_object(self, tmp_path):
        import echopype_tpu as ep
        from synth_ek60 import write_ek60_raw

        path = tmp_path / "ENV-D20200101-T000000.raw"
        write_ek60_raw(path, n_pings=4, n_samples=32)
        ed = ep.open_raw(path, sonar_model="EK60")
        obj = EnvParams(_env_stationary(), "stationary")
        with pytest.raises(ValueError, match="'env_params' has to be None or a dict"):
            ep.calibrate.compute_Sv(ed, env_params=obj)
        with pytest.raises(ValueError, match="'cal_params' has to be None or a dict"):
            ep.calibrate.compute_Sv(ed, cal_params=[("gain_correction", 1.0)])

    def test_applied_dict_feeds_compute_sv(self, tmp_path):
        """The documented workflow: _apply -> dict -> compute_Sv on an EK80
        file (its Platform always carries time3, set_groups_ek80.py:506),
        with the time1-indexed DataArrays harmonized onto ping_time
        (env_params.py:24-71) and the interpolated temperature actually
        changing sound speed/absorption downstream."""
        import echopype_tpu as ep
        from synth_ek80 import write_ek80_raw

        path = tmp_path / "ENV80-D20210201-T000000.raw"
        write_ek80_raw(path, n_pings=4, n_samples=32)
        ed = ep.open_raw(path, sonar_model="EK80")

        # env range straddles the Platform's time3 stamps
        t3p = np.asarray(ed["Platform"]["time3"].values)
        t3 = np.concatenate(
            [t3p[:1] - np.timedelta64(60, "s"), t3p[-1:] + np.timedelta64(60, "s")]
        )
        env = Dataset(
            data_vars={
                "temperature": ("time3", np.array([12.0, 14.0])),
                "salinity": ("time3", np.array([33.0, 33.5])),
                "pressure": ("time3", np.array([60.0, 60.0])),
            },
            coords={"time3": t3},
        )
        applied = EnvParams(env, "stationary")._apply(ed)
        assert set(applied) == {"temperature", "salinity", "pressure"}
        sv_env = ep.calibrate.compute_Sv(
            ed, env_params=dict(applied), waveform_mode="CW", encode_mode="power"
        )
        sv_default = ep.calibrate.compute_Sv(ed, waveform_mode="CW", encode_mode="power")
        assert np.isfinite(np.asarray(sv_env["Sv"].values)).any()
        # the external CTD temperature differs from the file's Environment
        # group, so sound speed (hence Sv) must shift
        assert not np.allclose(
            np.asarray(sv_env["Sv"].values),
            np.asarray(sv_default["Sv"].values),
            equal_nan=True,
        )
