"""EK60 calibration tests: fused kernel vs float64 brute-force oracle.

The oracle implements the sonar equation (reference contract
calibrate_ek.py:79-206) directly in numpy float64 from the synthetic file's
ground-truth values.
"""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.convert.simrad.decode import INDEX2POWER

from synth_ek60 import write_ek60_raw

C_WATER = 1480.0
ALPHA = 0.0098
SAMPLE_INT = 256e-6
TAU = 1024e-6
EBA = -20.7


@pytest.fixture(scope="module")
def cal_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cal")
    path = tmp / "CAL-D20200101-T000000.raw"
    truth = write_ek60_raw(path, n_pings=8, n_samples=60)
    ed = ep.open_raw(path, sonar_model="EK60")
    return ed, truth


def oracle_sv(power_db, transmit_power, gain, sa, freq, cal_type="Sv"):
    """Brute-force float64 sonar equation."""
    n_ping, n_r = power_db.shape
    k = np.arange(n_r, dtype="f8")
    dr = SAMPLE_INT * C_WATER / 2
    r = k * dr
    r_tvg = r - 2 * dr
    r_tvg = np.where(r_tvg > 0, r_tvg, np.nan)
    wavelength = C_WATER / freq
    if cal_type == "Sv":
        csv = (
            10 * np.log10(transmit_power)
            + 2 * gain
            + EBA
            + 10 * np.log10(wavelength**2 * TAU * C_WATER / (32 * np.pi**2))
        )
        return power_db + 20 * np.log10(r_tvg)[None, :] + 2 * ALPHA * r_tvg[None, :] - csv - 2 * sa
    csp = 10 * np.log10(transmit_power) + 2 * gain + 10 * np.log10(wavelength**2 / (16 * np.pi**2))
    return power_db + 40 * np.log10(r_tvg)[None, :] + 2 * ALPHA * r_tvg[None, :] - csp


class TestComputeSv:
    def test_sv_matches_oracle(self, cal_setup):
        ed, truth = cal_setup
        ds = ep.calibrate.compute_Sv(ed)
        sv = ds["Sv"].values
        assert sv.shape == (2, 8, 60)
        # channel 0 = 18 kHz (sorted), source channel 1
        for ci, (src, freq, pt) in enumerate([(1, 18000.0, 1900.0), (2, 38000.0, 1800.0)]):
            power_db = np.stack(truth["power_idx"][src]).astype("f4").astype("f8") * INDEX2POWER
            # pulse_length 1024us matches table idx 2 -> gain 22+..? table [22..26]
            gain, sa = 24.0, -0.2
            expected = oracle_sv(power_db, pt, gain, sa, freq)
            np.testing.assert_allclose(sv[ci], expected, atol=2e-4, rtol=0)

    def test_first_samples_nan(self, cal_setup):
        """Samples with r_tvg <= 0 (range_sample 0..2) must be NaN."""
        ed, truth = cal_setup
        ds = ep.calibrate.compute_Sv(ed)
        assert np.isnan(ds["Sv"].values[:, :, :3]).all()
        assert not np.isnan(ds["Sv"].values[:, :, 3:]).any()

    def test_echo_range(self, cal_setup):
        ed, truth = cal_setup
        ds = ep.calibrate.compute_Sv(ed)
        er = ds["echo_range"].values
        expected = np.arange(60) * SAMPLE_INT * C_WATER / 2
        np.testing.assert_allclose(er[0, 0], expected, rtol=1e-6, atol=1e-5)

    def test_ts_matches_oracle(self, cal_setup):
        ed, truth = cal_setup
        ds = ep.calibrate.compute_TS(ed)
        ts = ds["TS"].values
        power_db = np.stack(truth["power_idx"][1]).astype("f4").astype("f8") * INDEX2POWER
        expected = oracle_sv(power_db, 1900.0, 24.0, -0.2, 18000.0, cal_type="TS")
        np.testing.assert_allclose(ts[0], expected, atol=2e-4, rtol=0)

    def test_output_metadata(self, cal_setup):
        ed, truth = cal_setup
        ds = ep.calibrate.compute_Sv(ed)
        assert ds["Sv"].attrs["units"] == "dB"
        assert ds.attrs["processing_function"] == "calibrate.compute_Sv"
        # reference parity: no processing level until location data is added
        assert "processing_level" not in ds.attrs
        for v in ["echo_range", "frequency_nominal", "tau_effective", "water_level",
                  "sound_speed", "sound_absorption", "sa_correction", "gain_correction",
                  "equivalent_beam_angle", "source_filenames"]:
            assert v in ds, v

    def test_user_env_params_override(self, cal_setup):
        """User T/S/P/pH triggers recomputed sound speed & absorption."""
        ed, truth = cal_setup
        ds = ep.calibrate.compute_Sv(
            ed, env_params={"temperature": 10.0, "salinity": 33.0, "pressure": 50.0, "pH": 8.1}
        )
        from echopype_tpu.utils import uwa

        c_expected = uwa.calc_sound_speed(10.0, 33.0, 50.0)
        np.testing.assert_allclose(float(ds["sound_speed"].values), c_expected)
        # absorption recomputed per channel with FG formula
        ab = ds["sound_absorption"].values
        assert ab.shape[0] == 2 and np.all(ab > 0)

    def test_user_cal_params_override(self, cal_setup):
        ed, truth = cal_setup
        ds0 = ep.calibrate.compute_Sv(ed)
        ds1 = ep.calibrate.compute_Sv(ed, cal_params={"gain_correction": [30.0, 30.0]})
        # Sv shifts by -2 * (30 - 24) for channel 0
        diff = ds1["Sv"].values[0, :, 10] - ds0["Sv"].values[0, :, 10]
        np.testing.assert_allclose(diff, -2 * (30.0 - 24.0), atol=1e-3)

    def test_ek60_rejects_bb(self, cal_setup):
        ed, truth = cal_setup
        with pytest.raises(ValueError):
            ep.calibrate.compute_Sv(ed, waveform_mode="BB")

    def test_nan_padding_propagates(self, tmp_path):
        path = tmp_path / "RAG-D20200101-T000000.raw"
        write_ek60_raw(path, n_pings=6, n_samples=40, ragged=True)
        ed = ep.open_raw(path, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        sv = ds["Sv"].values
        # ping 1 shorter by 5 samples: padded tail must stay NaN
        assert np.isnan(sv[0, 1, 35:]).all()
        assert np.isnan(ds["echo_range"].values[0, 1, 35:]).all()


class TestEnvParamTimeHarmonization:
    def test_time1_interp_onto_ping_time(self):
        """env_params.py:24-71 parity: time1 params interpolate to ping_time."""
        import numpy as np

        from echopype_tpu.calibrate.env_params import harmonize_env_param_time
        from echopype_tpu.xrlite import DataArray

        t1 = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(0, 40, 10) * np.timedelta64(1, "s")
        pt = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(0, 31, 5) * np.timedelta64(1, "s")
        p = DataArray(np.array([1480.0, 1490.0, 1500.0, 1510.0]), ("time1",),
                      coords={"time1": t1})
        out = harmonize_env_param_time(p, ping_time=DataArray(pt, ("ping_time",)))
        np.testing.assert_allclose(out.values, [1480, 1485, 1490, 1495, 1500, 1505, 1510])
        # single-value collapses to scalar
        p1 = DataArray(np.array([1482.0]), ("time1",), coords={"time1": t1[:1]})
        assert harmonize_env_param_time(p1).ndim == 0
        # all-NaN-except-one collapses too
        pn = DataArray(np.array([np.nan, 1490.0, np.nan, np.nan]), ("time1",),
                       coords={"time1": t1})
        assert float(harmonize_env_param_time(pn).values) == 1490.0
        # scalar passthrough
        assert harmonize_env_param_time(3.5) == 3.5
