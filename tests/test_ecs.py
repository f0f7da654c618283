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


ECS_EK80_BB_CONTENT = """#========================================================================================#
#                    ECHOVIEW CALIBRATION SUPPLEMENT (.ECS) FILE (SimradEK80Raw)         #
#                                3/5/2023 14:02:59.1234                                  #
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

SoundSpeed = 1490.0 # (meters per second)
Salinity = 34.2 # (PSU)
# TvgRangeCorrection = # [None, BySamples, SimradEx500, SimradEx60]

#========================================================================================#
#                                   SOURCECAL SETTINGS                                   #
#========================================================================================#

SourceCal T1
    # Frequency = 70.00 # (kilohertz) [0.01..10000.00]
    AbsorptionDepth = 50.0 # (meters)
    FrequencyTableWideband = 55.0 65.0 75.0 85.0 # (kilohertz)
    GainTableWideband = 26.1 26.5 26.9 27.0 # (decibels)
    MajorAxisBeamWidthTableWideband = 7.1 6.8 6.4 6.1 # (degrees)
    MajorAxis3dbBeamAngle = 7.0 # (degrees)
    Temperature = 9.5 # (degrees celsius)
    TransducerGain = 26.50 # (decibels)

SourceCal T2
    # Frequency = 120.00 # (kilohertz) [0.01..10000.00]
    FrequencyTableWideband = 100.0 115.0 130.0 # (kilohertz)
    GainTableWideband = 24.0 24.5 24.2 # (decibels)
    MajorAxis3dbBeamAngle = 6.5 # (degrees)
    TransducerGain = 24.40 # (decibels)

#========================================================================================#
#                                    LOCALCAL SETTINGS                                   #
#========================================================================================#

LocalCal MyPatch
    SoundSpeed = 1500.0 # (meters per second)
"""


class TestECSEdgeCases:
    """LocalCal overrides, commented params, BB vectors, typed values."""

    def test_missing_frequency_raises(self, tmp_path):
        """An ECS file whose SourceCal blocks carry parameters but no
        'Frequency' line (commented counts — both parsers special-case it)
        cannot be mapped onto data channels.  The reference crashes with a
        bare KeyError('frequency_nominal') (reference ecs.py:355 indexes
        ds_cal unconditionally); we raise a descriptive ValueError instead
        of silently dropping the user's calibration parameters.  Found by
        the `ecs80` soak mode."""
        from echopype_tpu.calibrate.ecs import ecs_to_params
        from echopype_tpu.xrlite import DataArray

        content = ECS_CONTENT
        assert "Frequency =" in content
        # strip every Frequency assignment (commented or not)
        lines = [
            ln for ln in content.splitlines()
            if "Frequency =" not in ln or "Table" in ln
        ]
        ecs = tmp_path / "nofreq.ecs"
        ecs.write_text("\n".join(lines) + "\n")
        freq = DataArray(
            np.array([18000.0, 38000.0]), ("channel",),
            coords={"channel": np.array(["c1", "c2"], dtype=object)},
            name="frequency_nominal",
        )
        with pytest.raises(ValueError, match="no 'Frequency' line"):
            ecs_to_params(str(ecs), "EK60", freq)

    def test_zero_overlap_ecs_is_inert(self, tmp_path):
        """An ECS file whose frequencies overlap NONE of the data channels
        applies nothing: compute_Sv(ecs_file=) equals plain compute_Sv.
        Inverted finding (ecs80 soak): the reference CRASHES here —
        conform_channel_order returns None on zero overlap and
        calibrate_ek.py:350 feeds it to ecs_ds2dict, AttributeError.  Ours
        keeps the reference's documented semantics (None -> drop) without
        the crash."""
        content = ECS_CONTENT.replace("Frequency = 18.00", "Frequency = 333.00")
        content = content.replace("Frequency = 38.00", "Frequency = 555.00")
        ecs = tmp_path / "nooverlap.ecs"
        ecs.write_text(content)
        raw = tmp_path / "ZO-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=4, n_samples=30, seed=3)
        ed = ep.open_raw(str(raw), sonar_model="EK60")
        plain = ep.calibrate.compute_Sv(ed, precision="float64")["Sv"]
        with_ecs = ep.calibrate.compute_Sv(
            ed, ecs_file=str(ecs), precision="float64"
        )["Sv"]
        np.testing.assert_array_equal(
            np.asarray(with_ecs.values), np.asarray(plain.values)
        )

    def test_tableless_ecs_bb_applies_scalars(self, tmp_path):
        """A BB calibration with an ECS carrying NO wideband tables (scalar
        TransducerGain only) must apply the scalar params.  Inverted finding
        (round-5 ecs80 soak, seed 332342250): the reference CRASHES here —
        ecs_ev2ep returns ds_cal_BB=None when no channel carries tables and
        calibrate_ek.py:353 feeds it to conform_channel_order (ecs.py:442
        AttributeError 'coords').  Ours applies the scalars."""
        from synth_ek80 import write_ek80_raw

        lines = [
            "Version 1.00",
            "SourceCal T1",
            "    # Frequency = 70.00 # (kilohertz)",
            "    TransducerGain = 26.30 # (decibels)",
        ]
        ecs = tmp_path / "tableless.ecs"
        ecs.write_text("\n".join(lines) + "\n")
        raw = tmp_path / "TL-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=3, n_samples=64,
                       with_power_channel=False, with_cw_complex=False)
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        out = ep.calibrate.compute_Sv(
            ed, ecs_file=str(ecs), waveform_mode="BB", encode_mode="complex",
            precision="float64",
        )
        assert np.isfinite(np.asarray(out["Sv"].values)).any()
        g = np.asarray(out["gain_correction"].values, dtype="f8")
        assert np.allclose(g[np.isfinite(g)], 26.30)

    def test_duplicate_alias_last_in_file_wins(self):
        """EV aliases mapping to one echopype param resolve deterministically
        to the LAST assignment in the file, per channel.

        The reference iterates a Python SET of EV names in its ecs_ev2ep, so
        with duplicate aliases (TransducerGain vs Ek60TransducerGain,
        SaCorrectionFactor vs EK60SaCorrection) its winner follows
        PYTHONHASHSEED — verified empirically: the same ECS file calibrates
        to different Sv across processes (hash seeds 6/7/10 pick
        TransducerGain+SaCorrectionFactor; 4/5/8 the EK60 variants).  Found
        by the `ecs` soak mode; ours pins the user-predictable rule."""
        ev_dict = {
            # T1: plain then EK60-prefixed -> the later EK60 names win
            "T1": {"Frequency": 18.0, "TransducerGain": 21.0,
                   "Ek60TransducerGain": 23.0, "SaCorrectionFactor": -0.2,
                   "EK60SaCorrection": -0.7},
            # T2: reversed order -> the plain names win
            "T2": {"Frequency": 38.0, "EK60SaCorrection": -0.9,
                   "SaCorrectionFactor": -0.1, "Ek60TransducerGain": 25.0,
                   "TransducerGain": 27.0},
            # T3: single alias per channel merges across channels
            "T3": {"Frequency": 120.0, "Ek60TransducerGain": 24.5},
        }
        _, ds_cal, _ = ecs_ev2ep(ev_dict, "EK60")
        np.testing.assert_array_equal(
            np.asarray(ds_cal["gain_correction"].values), [23.0, 27.0, 24.5])
        np.testing.assert_array_equal(
            np.asarray(ds_cal["sa_correction"].values), [-0.7, -0.1, np.nan])

    def test_localcal_alias_precedence(self, tmp_path):
        """A LocalCal override must beat a SourceCal ALIAS of the same
        echopype param through the full parse + consolidate + ev2ep chain.

        dict.update keeps an overridden key's original insertion position,
        so a naive merge left the LocalCal TransducerGain EARLIER in the
        consolidated dict than SourceCal's Ek60TransducerGain and the
        by-position alias resolution silently discarded the
        highest-precedence value (review finding; consolidated() now
        reinserts on override)."""
        ecs = tmp_path / "lc.ecs"
        ecs.write_text(ECS_CONTENT.replace(
            "SourceCal T1\n",
            "SourceCal T1\n    Ek60TransducerGain = 23.00\n",
        ) + "\nLocalCal T1\n    TransducerGain = 25.00\n")
        parser = ECSParser(str(ecs))
        parser.parse()
        _, ds_cal, _ = ecs_ev2ep(parser.get_cal_params(), "EK60")
        g = np.asarray(ds_cal["gain_correction"].values)
        # T1: LocalCal 25.0 wins over SourceCal's 22.95 AND the alias 23.0;
        # T2: LocalCal applies to all sources like the reference -> 25.0
        np.testing.assert_array_equal(g, [25.0, 25.0])

    def test_malformed_value_poisons_one_channel_only(self):
        """A non-numeric value for one channel's alias becomes NaN for that
        channel; the merged echopype param keeps other channels' values
        (review finding: whole-list float conversion dropped the param for
        every channel)."""
        ev_dict = {
            "T1": {"Frequency": 18.0, "TransducerGain": "notanumber"},
            "T2": {"Frequency": 38.0, "Ek60TransducerGain": 26.0},
        }
        _, ds_cal, _ = ecs_ev2ep(ev_dict, "EK60")
        np.testing.assert_array_equal(
            np.asarray(ds_cal["gain_correction"].values), [np.nan, 26.0])

    @pytest.fixture()
    def ek80_ecs_file(self, tmp_path):
        p = tmp_path / "bb.ecs"
        p.write_text(ECS_EK80_BB_CONTENT)
        return p

    def test_header_and_commented_frequency(self, ek80_ecs_file):
        parser = ECSParser(ek80_ecs_file)
        parser.parse()
        assert parser.data_type == "SimradEK80Raw"
        assert parser.file_creation_time is not None
        assert parser.file_creation_time.year == 2023
        params = parser.get_cal_params()
        # commented-out Frequency lines are still channel identity
        assert params["T1"]["Frequency"] == 70.0
        assert params["T2"]["Frequency"] == 120.0
        # commented-out non-Frequency params are dropped
        assert "TvgRangeCorrection" not in params["T1"]

    def test_localcal_overrides_all_sources(self, ek80_ecs_file):
        params = ECSParser(ek80_ecs_file).get_cal_params()
        assert params["T1"]["SoundSpeed"] == 1500.0
        assert params["T2"]["SoundSpeed"] == 1500.0
        # fileset value survives where not overridden
        assert params["T1"]["Salinity"] == 34.2
        # sourcecal beats fileset
        assert params["T1"]["TransducerGain"] == 26.5

    def test_bb_tables(self, ek80_ecs_file):
        params = ECSParser(ek80_ecs_file).get_cal_params()
        np.testing.assert_allclose(
            params["T1"]["FrequencyTableWideband"], [55.0, 65.0, 75.0, 85.0]
        )
        ds_env, ds_cal, ds_bb = ecs_ev2ep(params, "EK80")
        assert ds_bb is not None
        # union frequency axis AS LISTED — the reference applies no unit
        # conversion to the wideband table axis (ecs.py:383-388)
        np.testing.assert_allclose(
            ds_bb.coords["cal_frequency"].values,
            [55.0, 65.0, 75.0, 85.0, 100.0, 115.0, 130.0],
        )
        gain = np.asarray(ds_bb["gain_correction"].values)
        assert gain.shape == (2, 7)
        np.testing.assert_allclose(gain[0, :4], [26.1, 26.5, 26.9, 27.0])
        assert np.isnan(gain[0, 4:]).all()
        np.testing.assert_allclose(gain[1, 4:], [24.0, 24.5, 24.2])
        # beamwidth table only on T1
        bw = np.asarray(ds_bb["beamwidth_athwartship"].values)
        np.testing.assert_allclose(bw[0, :4], [7.1, 6.8, 6.4, 6.1])
        assert np.isnan(bw[1]).all()
        # env params flow through
        np.testing.assert_allclose(ds_env["salinity"].values, [34.2, 34.2])
        np.testing.assert_allclose(ds_env["temperature"].values[0], 9.5)

    def test_named_localcal_selection(self, tmp_path):
        content = ECS_EK80_BB_CONTENT + (
            "\nLocalCal Another\n    SoundSpeed = 1450.0 # (meters per second)\n"
        )
        p = tmp_path / "two_local.ecs"
        p.write_text(content)
        params = ECSParser(p).get_cal_params(localcal_name="Another")
        assert params["T1"]["SoundSpeed"] == 1450.0

    def test_tvg_range_correction_validation(self, tmp_path):
        good = ECS_CONTENT.replace(
            "SoundSpeed = 1473.0 # (meters per second)",
            "SoundSpeed = 1473.0 # (meters per second)\nTvgRangeCorrection = SimradEx60",
        )
        p = tmp_path / "tvg.ecs"
        p.write_text(good)
        parser = ECSParser(p)
        parser.parse()
        assert parser.parsed_params["fileset"]["TvgRangeCorrection"] == "SimradEx60"
        bad = good.replace("TvgRangeCorrection = SimradEx60", "TvgRangeCorrection = Bogus")
        p2 = tmp_path / "tvg_bad.ecs"
        p2.write_text(bad)
        with pytest.raises(ValueError, match="TvgRangeCorrection"):
            ECSParser(p2).parse()

    def test_unrecognized_content_raises_with_lineno(self, tmp_path):
        p = tmp_path / "junk.ecs"
        p.write_text(ECS_CONTENT + "\nthis is not an assignment\n")
        with pytest.raises(ValueError, match="line"):
            ECSParser(p).parse()


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


# EK80 BB ECS with wideband tables on an Hz frequency axis: the reference
# applies NO unit conversion to FrequencyTableWideband (ecs.py:383-388), so
# working Echoview EK80 tables carry Hz; this variant spans the synthetic
# ES70 BB channel's center frequency so the gain-table interpolation chain
# produces finite values end to end.  T2 (200 kHz) deliberately has NO
# wideband table -> narrowband fallback path.
ECS_EK80_BB_HZ_CONTENT = (
    ECS_EK80_BB_CONTENT
    .replace(
        "FrequencyTableWideband = 55.0 65.0 75.0 85.0 # (kilohertz)",
        "FrequencyTableWideband = 45000.0 55000.0 67500.0 80000.0 90000.0 # (hertz)",
    )
    .replace(
        "GainTableWideband = 26.1 26.5 26.9 27.0 # (decibels)",
        "GainTableWideband = 26.1 26.5 26.9 27.0 27.2 # (decibels)",
    )
    .replace(
        "MajorAxisBeamWidthTableWideband = 7.1 6.8 6.4 6.1 # (degrees)",
        "MajorAxisBeamWidthTableWideband = 7.1 6.8 6.4 6.1 5.9 # (degrees)",
    )
    .replace("# Frequency = 120.00", "# Frequency = 200.00")
    .replace(
        "FrequencyTableWideband = 100.0 115.0 130.0 # (kilohertz)\n    GainTableWideband = 24.0 24.5 24.2 # (decibels)\n",
        "",
    )
)
