"""consolidate package tests using the synthetic EK60 pipeline."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import DataArray

from synth_ek60 import write_ek60_raw


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("consolidate")
    path = tmp / "CON-D20200101-T000000.raw"
    write_ek60_raw(path, n_pings=10, n_samples=50)
    ed = ep.open_raw(path, sonar_model="EK60")
    ds_Sv = ep.calibrate.compute_Sv(ed)
    return ed, ds_Sv


class TestSwapDims:
    def test_swap(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.swap_dims_channel_frequency(ds_Sv)
        assert "frequency_nominal" in out["Sv"].dims
        assert "channel" in out.data_vars
        np.testing.assert_allclose(
            out.coords["frequency_nominal"].values, [18000.0, 38000.0]
        )

    def test_duplicate_freq_raises(self, pipeline):
        ed, ds_Sv = pipeline
        ds = ds_Sv.copy()
        ds["frequency_nominal"] = (("channel",), np.array([38000.0, 38000.0]))
        with pytest.raises(ValueError):
            ep.consolidate.swap_dims_channel_frequency(ds)


class TestAddDepth:
    def test_scalar_offset_and_tilt(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.add_depth(ds_Sv, depth_offset=5.0, tilt=60.0)
        er = ds_Sv["echo_range"].values
        np.testing.assert_allclose(
            out["depth"].values, 5.0 + er * np.cos(np.deg2rad(60.0)), rtol=1e-6
        )
        # no location data on the Sv dataset -> no stamp (reference gating)
        assert "processing_level" not in out.attrs
        ds_loc = ep.consolidate.add_location(ds_Sv, ed)
        out2 = ep.consolidate.add_depth(ds_loc, depth_offset=5.0, tilt=60.0)
        assert out2.attrs["processing_level"] == "Level 2A"

    def test_upward(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.add_depth(ds_Sv, depth_offset=100.0, downward=False)
        er = ds_Sv["echo_range"].values
        np.testing.assert_allclose(out["depth"].values, 100.0 - er, rtol=1e-6)

    def test_platform_vertical_offsets(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.add_depth(ds_Sv, echodata=ed, use_platform_vertical_offsets=True)
        # transducer_depth = transducer_offset_z - (water_level + vertical_offset)
        # synth: pos_z=0, transducer_depth datagram value 9.15 -> water_level=9.15,
        # heave=0 -> transducer depth = 0 - 9.15 = -9.15
        er = ds_Sv["echo_range"].values
        np.testing.assert_allclose(out["depth"].values[:, 0], (-9.15 + er)[:, 0], rtol=1e-5)

    def test_needs_echodata(self, pipeline):
        ed, ds_Sv = pipeline
        with pytest.raises(ValueError):
            ep.consolidate.add_depth(ds_Sv, use_beam_angles=True)

    def test_both_angles_not_implemented(self, pipeline):
        ed, ds_Sv = pipeline
        with pytest.raises(NotImplementedError):
            ep.consolidate.add_depth(
                ds_Sv, echodata=ed, use_platform_angles=True, use_beam_angles=True
            )

    def test_time_varying_offset(self, pipeline):
        ed, ds_Sv = pipeline
        pt = ds_Sv.coords["ping_time"].values
        off = DataArray(
            np.linspace(0, 9, len(pt)), ("time_ext",), coords={"time_ext": pt}
        )
        out = ep.consolidate.add_depth(ds_Sv, depth_offset=off)
        assert out["depth"].dims == ("channel", "ping_time", "range_sample")
        d0 = out["depth"].values[0, :, 0]
        np.testing.assert_allclose(d0, np.linspace(0, 9, len(pt)), atol=1e-9)


class TestAddLocation:
    def test_interpolates(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.add_location(ds_Sv, ed)
        assert "latitude" in out and "longitude" in out
        lat = out["latitude"].values
        assert lat.shape == (ds_Sv.sizes["ping_time"],)
        assert np.isfinite(lat).all()
        assert np.all((lat > 29) & (lat < 31))

    def test_nmea_sentence_filter(self, pipeline):
        ed, ds_Sv = pipeline
        out = ep.consolidate.add_location(ds_Sv, ed, nmea_sentence="GGA")
        assert np.isfinite(out["latitude"].values).all()

    def test_bad_datagram_type(self, pipeline):
        ed, ds_Sv = pipeline
        with pytest.raises(ValueError):
            ep.consolidate.add_location(ds_Sv, ed, datagram_type="MRU1")


class TestSplitbeamAngle:
    def test_power_mode(self, pipeline):
        ed, ds_Sv = pipeline
        ds = ds_Sv.copy()
        # angle params live in beam group; attach to Sv dataset as required
        beam = ed["Sonar/Beam_group1"]
        for p in [
            "angle_sensitivity_alongship",
            "angle_sensitivity_athwartship",
            "angle_offset_alongship",
            "angle_offset_athwartship",
        ]:
            ds[p] = beam[p]
        out = ep.consolidate.add_splitbeam_angle(
            ds, ed, waveform_mode="CW", encode_mode="power", to_disk=False
        )
        assert "angle_alongship" in out and "angle_athwartship" in out
        # physical = raw*(180/128)/sensitivity - offset; sens=21.9, offset=0
        raw = beam["angle_alongship"].values
        expected = raw * (180.0 / 128.0) / 21.9
        np.testing.assert_allclose(out["angle_alongship"].values, expected, rtol=1e-5)

    def test_missing_params_raises(self, pipeline):
        ed, ds_Sv = pipeline
        ds = ds_Sv.copy()
        for p in list(ds.data_vars):
            if p.startswith("angle_"):
                del ds.data_vars[p]
        with pytest.raises(ValueError):
            ep.consolidate.add_splitbeam_angle(
                ds, ed, waveform_mode="CW", encode_mode="power", to_disk=False
            )
