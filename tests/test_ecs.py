"""ECS file parsing tests."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.calibrate.ecs import ECSParser, conform_channel_order, ecs_ev2ep
from echopype_tpu.xrlite import DataArray

from synth_ek60 import write_ek60_raw

ECS_CONTENT = """#========================================================================================#
#                    ECHOVIEW CALIBRATION SUPPLEMENT (.ECS) FILE (SimradEK60Raw)         #
#                                12/20/2022 08:30:15.0000                                #
#========================================================================================#
#       +----------+   +-----------+   +----------+   +-----------+   +----------+       #
#       | Default  |-->| Data File |-->| Fileset  |-->| SourceCal |-->| LocalCal |       #
#       | Settings |   | Settings  |   | Settings |   | Settings  |   | Settings |       #
#       +----------+   +-----------+   +----------+   +-----------+   +----------+       #
# - Settings to the right override those to their left.                                  #
# - See the Help file page "About calibration".                                          #
#========================================================================================#

Version 1.00


#========================================================================================#
#                                    FILESET SETTINGS                                    #
#========================================================================================#

SoundSpeed = 1473.0 # (meters per second)
# TvgRangeCorrection = # [None, BySamples, ...]

#========================================================================================#
#                                   SOURCECAL SETTINGS                                   #
#========================================================================================#

SourceCal T1
    AbsorptionCoefficient = 0.002822 # (decibels per meter)
    Frequency = 18.00 # (kilohertz)
    TransducerGain = 22.95 # (decibels)
    SaCorrectionFactor = -0.49 # (decibels)
    TwoWayBeamAngle = -17.37 # (decibels re 1 steradian)

SourceCal T2
    AbsorptionCoefficient = 0.009855 # (decibels per meter)
    Frequency = 38.00 # (kilohertz)
    TransducerGain = 26.17 # (decibels)
    SaCorrectionFactor = -0.61 # (decibels)
    TwoWayBeamAngle = -20.72 # (decibels re 1 steradian)

#========================================================================================#
#                                    LOCALCAL SETTINGS                                   #
#========================================================================================#

"""


@pytest.fixture()
def ecs_file(tmp_path):
    p = tmp_path / "cal.ecs"
    p.write_text(ECS_CONTENT)
    return p


class TestECSParser:
    def test_parse_hierarchy(self, ecs_file):
        parser = ECSParser(ecs_file)
        parser.parse()
        assert parser.data_type == "SimradEK60Raw"
        assert parser.version == "1.00"
        params = parser.get_cal_params()
        assert set(params) == {"T1", "T2"}
        # fileset value propagated
        assert params["T1"]["SoundSpeed"] == 1473.0
        # sourcecal overrides
        assert params["T1"]["TransducerGain"] == 22.95
        assert params["T2"]["Frequency"] == 38.0

    def test_ev2ep(self, ecs_file):
        parser = ECSParser(ecs_file)
        parser.parse()
        ds_env, ds_cal, ds_bb = ecs_ev2ep(parser.get_cal_params(), "EK60")
        assert ds_bb is None
        np.testing.assert_allclose(ds_cal["frequency_nominal"].values, [18000.0, 38000.0])
        np.testing.assert_allclose(ds_cal["gain_correction"].values, [22.95, 26.17])
        np.testing.assert_allclose(ds_env["sound_speed"].values, [1473.0, 1473.0])
        np.testing.assert_allclose(ds_env["sound_absorption"].values, [0.002822, 0.009855])

    def test_conform_channel_order(self, ecs_file):
        parser = ECSParser(ecs_file)
        parser.parse()
        _, ds_cal, _ = ecs_ev2ep(parser.get_cal_params(), "EK60")
        # reference data has 38 kHz first
        freq_ref = DataArray(
            np.array([38000.0, 18000.0]),
            ("channel",),
            coords={"channel": np.array(["chB", "chA"], dtype=object)},
        )
        out = conform_channel_order(ds_cal, freq_ref)
        np.testing.assert_allclose(out["gain_correction"].values, [26.17, 22.95])
        assert list(out.coords["channel"].values) == ["chB", "chA"]


class TestECSCalibration:
    def test_compute_sv_with_ecs(self, tmp_path, ecs_file):
        path = tmp_path / "ECS-D20200101-T000000.raw"
        write_ek60_raw(path, n_pings=6, n_samples=40)
        ed = ep.open_raw(path, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed, ecs_file=str(ecs_file))
        ds0 = ep.calibrate.compute_Sv(ed)
        # ECS gain (18 kHz: 22.95) differs from vendor-matched gain (24.0):
        # Sv shifts by -2 * (22.95 - 24.0)
        diff = ds["Sv"].values[0, 0, 10] - ds0["Sv"].values[0, 0, 10]
        # also sound speed and absorption differ, so just check the shift sign
        # and that ECS params were picked up
        np.testing.assert_allclose(np.asarray(ds["sound_speed"].values).ravel(), 1473.0)
        np.testing.assert_allclose(
            ds["gain_correction"].values.ravel()[0], 22.95
        )
        assert np.isfinite(diff)
