"""Reference-differential parity for the L2 group-assembly layer.

The reference's complete conversion pipeline — RawSimradFile datagram read,
ParseEK60, rectangularize, SetGroupsEK60 — executes on the facade
(plus pynmea2 / dask.utils / zarr.codecs shims in ref_oracle) against the
same synthetic file our `open_raw` converts.  Every group's variables must
match value-for-value (reference: convert/parse_ek60.py, set_groups_ek60.py,
set_groups_base.py).
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import load_ref
from synth_ek60 import write_ek60_raw

CONVERT_PARAMS = {
    "survey_name": "", "platform_name": "", "platform_type": "",
    "platform_code_ICES": "", "water_level": np.nan, "nmea_gps_sentence": "GGA",
}


@pytest.fixture(scope="module")
def converted_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ref_setgroups")
    raw = tmp / "SG-D20200101-T000000.raw"
    write_ek60_raw(raw, n_pings=14, n_samples=70, with_nmea=True, with_angle=True)

    ref_parse = load_ref("convert/parse_ek60")
    parser = ref_parse.ParseEK60(str(raw), storage_options={}, sonar_model="EK60")
    parser.parse_raw()
    parser.rectangularize_data(use_swap=False)
    ref_sg = load_ref("convert/set_groups_ek60")
    sg = ref_sg.SetGroupsEK60(
        parser, input_file=str(raw), xml_path=None, output_path=None,
        sonar_model="EK60", params=dict(CONVERT_PARAMS),
    )
    ref_groups = {
        "Environment": sg.set_env(),
        "Platform": sg.set_platform(),
        "Platform/NMEA": sg.set_nmea(),
        "Sonar/Beam_group1": sg.set_beam()[0],
        "Vendor_specific": sg.set_vendor(),
    }
    ed = ep.open_raw(str(raw), sonar_model="EK60")
    return ref_groups, ed


def _cmp(ref_ds, our_ds, var, rtol=0.0, atol=0.0):
    w_da = ref_ds[var]
    g_da = our_ds[var]
    order = [d for d in g_da.dims if d in w_da.dims]
    if tuple(order) != w_da.dims and order:
        w_da = w_da.transpose(*order)
    w = np.asarray(w_da.values)
    g = np.asarray(g_da.values)
    assert g.shape == w.shape, f"{var}: {g.shape} vs {w.shape}"
    if w.dtype.kind in ("U", "O", "S", "M"):
        np.testing.assert_array_equal(g, w, err_msg=var)
    else:
        w = w.astype("f8")
        g = g.astype("f8")
        np.testing.assert_array_equal(np.isnan(g), np.isnan(w), err_msg=var)
        m = ~np.isnan(w)
        np.testing.assert_allclose(g[m], w[m], rtol=rtol, atol=atol, err_msg=var)


class TestSetGroupsDifferential:
    def test_beam_group(self, converted_pair):
        ref_groups, ed = converted_pair
        ref_b = ref_groups["Sonar/Beam_group1"]
        our_b = ed["Sonar/Beam_group1"]
        for var in (
            # sample data: reference multiplies the int16 power by the
            # 10*log10(2)/256 constant in float32; ours folds it in float64
            # -> agree to f32 ulp
            "backscatter_r", "angle_alongship", "angle_athwartship",
            "frequency_nominal", "gain_correction", "equivalent_beam_angle",
            "angle_offset_alongship", "angle_offset_athwartship",
            "angle_sensitivity_alongship", "angle_sensitivity_athwartship",
            "beamwidth_twoway_alongship", "beamwidth_twoway_athwartship",
            "transmit_duration_nominal", "sample_interval", "transmit_power",
            "beam_type", "transmit_frequency_start", "transmit_frequency_stop",
        ):
            tol = 3e-7 if var in (
                "backscatter_r", "angle_alongship", "angle_athwartship"
            ) else 1e-12
            if var in ref_b.data_vars and var in our_b.data_vars:
                _cmp(ref_b, our_b, var, rtol=tol)
            else:
                assert (var in ref_b.data_vars) == (var in our_b.data_vars), var
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_b.coords["ping_time"].values, dtype="datetime64[ns]"),
        )
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["channel"].values),
            np.asarray(ref_b.coords["channel"].values),
        )

    def test_environment_group(self, converted_pair):
        ref_groups, ed = converted_pair
        for var in ("absorption_indicative", "sound_speed_indicative"):
            _cmp(ref_groups["Environment"], ed["Environment"], var, rtol=1e-12)

    def test_platform_group(self, converted_pair):
        ref_groups, ed = converted_pair
        ref_p, our_p = ref_groups["Platform"], ed["Platform"]
        for var in ("latitude", "longitude", "pitch", "roll", "vertical_offset",
                    "water_level"):
            if var in ref_p.data_vars and var in our_p.data_vars:
                _cmp(ref_p, our_p, var, rtol=1e-9)

    def test_nmea_group(self, converted_pair):
        ref_groups, ed = converted_pair
        ref_n, our_n = ref_groups["Platform/NMEA"], ed["Platform/NMEA"]
        np.testing.assert_array_equal(
            np.asarray(our_n["NMEA_datagram"].values),
            np.asarray(ref_n["NMEA_datagram"].values),
        )

    def test_vendor_group(self, converted_pair):
        ref_groups, ed = converted_pair
        ref_v, our_v = ref_groups["Vendor_specific"], ed["Vendor_specific"]
        for var in ("sa_correction", "gain_correction", "pulse_length"):
            _cmp(ref_v, our_v, var, rtol=1e-12)
