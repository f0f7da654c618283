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
    # squeeze singleton dims one side lacks (e.g. the reference drops the
    # channel dim on per-channel EK80 subsets)
    for d in list(g_da.dims):
        if d not in w_da.dims and g_da.sizes[d] == 1:
            g_da = g_da.isel({d: 0})
    for d in list(w_da.dims):
        if d not in g_da.dims and w_da.sizes[d] == 1:
            w_da = w_da.isel({d: 0})
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


class TestSetGroupsEK80Differential:
    """Reference ParseEK80 + SetGroupsEK80 vs our EK80 conversion: the 3-way
    beam split (BB complex / CW complex / CW power) and the Environment group
    (reference: set_groups_ek80.py set_beam/set_env)."""

    @pytest.fixture(scope="class")
    def ek80_pair(self, tmp_path_factory):
        from synth_ek80 import write_ek80_raw

        tmp = tmp_path_factory.mktemp("ref_setgroups_ek80")
        raw = tmp / "SG80-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=6, n_samples=64)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={}, sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        beams = sg.set_beam()
        env = sg.set_env()
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        return beams, env, ed

    def test_three_way_beam_split(self, ek80_pair):
        beams, _, ed = ek80_pair
        ours = [
            ed.get("Sonar/Beam_group1"),
            ed.get("Sonar/Beam_group2"),
            ed.get("Sonar/Beam_group3"),
        ]
        ref_present = [b is not None for b in beams]
        our_present = [b is not None for b in ours]
        assert ref_present == our_present

    @pytest.mark.parametrize("gi", [0, 1, 2])
    def test_beam_group_values(self, ek80_pair, gi):
        beams, _, ed = ek80_pair
        ref_b = beams[gi]
        our_b = ed.get(f"Sonar/Beam_group{gi + 1}")
        if ref_b is None:
            pytest.skip("group absent in both (split check covers presence)")
        for var in (
            "backscatter_r", "backscatter_i", "frequency_nominal",
            "transmit_duration_nominal", "sample_interval",
            "angle_alongship", "angle_athwartship",
            "transmit_frequency_start", "transmit_frequency_stop",
        ):
            has_ref = var in ref_b.data_vars
            has_our = var in our_b.data_vars
            assert has_ref == has_our, var
            if has_ref:
                _cmp(ref_b, our_b, var, rtol=3e-7)
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_b.coords["ping_time"].values, dtype="datetime64[ns]"),
        )

    def test_environment(self, ek80_pair):
        _, ref_env, ed = ek80_pair
        our_env = ed["Environment"]
        for var in ("sound_speed_indicative", "temperature", "salinity",
                    "acidity", "depth"):
            if var in ref_env.data_vars and var in our_env.data_vars:
                _cmp(ref_env, our_env, var, rtol=1e-12)

    def test_duplicate_ping_dedup_differential(self, tmp_path):
        """Duplicated RAW3 datagrams (same ping_time): the reference dedups
        via check_unique_ping_time_duplicates + Dataset.drop_duplicates
        (set_groups_ek80.py:1155-1162, running here ON the facade), ours via
        set_groups_ek80._dedup_rows — ping_time coords and values must
        match keep-first on every beam group."""
        from synth_ek80 import write_ek80_raw, CH_CW, CH_PW

        raw = tmp_path / "DUP80-D20210201-T000000.raw"
        # duplicates in CW-complex and power channels only: the reference's
        # dedup path only survives those (FM channels crash in
        # _add_freq_start_stop_ds — see the inverted-finding test below)
        write_ek80_raw(raw, n_pings=5, n_samples=32,
                       duplicate_pings={CH_CW: {0, 3}, CH_PW: {1}})

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={},
                                     sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        beams = sg.set_beam()
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        compared = 0
        for gi, ref_b in enumerate(beams):
            our_b = ed.get(f"Sonar/Beam_group{gi + 1}")
            assert (ref_b is None) == (our_b is None), gi
            if ref_b is None:
                continue
            rt = np.asarray(ref_b.coords["ping_time"].values,
                            dtype="datetime64[ns]")
            assert len(rt) == len(np.unique(rt)), "reference kept duplicates?"
            np.testing.assert_array_equal(
                np.asarray(our_b.coords["ping_time"].values,
                           dtype="datetime64[ns]"), rt)
            for var in ("backscatter_r", "backscatter_i"):
                if var in ref_b.data_vars:
                    _cmp(ref_b, our_b, var, rtol=3e-7)
                    compared += 1
        assert compared >= 3

    def test_duplicate_ping_fm_inverted(self, tmp_path):
        """INVERTED FINDING: duplicated RAW3 datagrams on a broadband (FM)
        channel crash the reference.  _remove_duplicates runs BEFORE
        _add_freq_start_stop_ds (set_groups_ek80.py:1168,1174), which then
        builds a Dataset from the raw *undeduped* frequency_start/end arrays
        against the deduped ping_time coord — a dim-size conflict xarray
        rejects.  Our conversion dedups consistently (rows_src indexing) and
        must reproduce the duplicate-free conversion exactly."""
        from synth_ek80 import write_ek80_raw, CH_BB

        raw_dup = tmp_path / "DUPFM-D20210201-T000000.raw"
        raw_clean = tmp_path / "CLNFM-D20210201-T000000.raw"
        write_ek80_raw(raw_dup, n_pings=5, n_samples=32,
                       duplicate_pings={CH_BB: {2}})
        write_ek80_raw(raw_clean, n_pings=5, n_samples=32)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw_dup), storage_options={},
                                     sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw_dup), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        with pytest.raises(ValueError):
            sg.set_beam()

        ed_dup = ep.open_raw(str(raw_dup), sonar_model="EK80")
        ed_clean = ep.open_raw(str(raw_clean), sonar_model="EK80")
        compared = 0
        for gi in range(1, 4):
            b_dup = ed_dup.get(f"Sonar/Beam_group{gi}")
            b_clean = ed_clean.get(f"Sonar/Beam_group{gi}")
            assert (b_dup is None) == (b_clean is None), gi
            if b_dup is None:
                continue
            np.testing.assert_array_equal(
                np.asarray(b_dup.coords["ping_time"].values),
                np.asarray(b_clean.coords["ping_time"].values))
            for var in ("backscatter_r", "backscatter_i",
                        "transmit_frequency_start", "transmit_frequency_stop"):
                if var in b_clean.data_vars:
                    _cmp(b_clean, b_dup, var, rtol=0.0)
                    compared += 1
        assert compared >= 4

    def test_f16_complex_inverted(self, tmp_path):
        """INVERTED FINDING: the reference's RAW3 float16-complex branch is
        broken — type_bytes=2 reads HALF the payload then bit-reinterprets
        the f16 buffer as complex64 (ek_raw_parsers.py:1746-1765), and when
        count*n_complex % 4 != 0 the reshape crashes outright.  Ours decodes
        2x f16 per complex value correctly (decode.py::_gather_f16_as_f32;
        truth-matched in test_convert_ek80).  Pin the crash class: count=21,
        4 sectors -> 84 f16 values read as 21 c8 -> reshape(-1, 4) fails."""
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "F16-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=3, n_samples=21, complex_f16=True,
                       with_power_channel=False, with_cw_complex=False)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={},
                                     sonar_model="EK80")
        with pytest.raises(ValueError, match="reshape"):
            parser.parse_raw()

        ed = ep.open_raw(str(raw), sonar_model="EK80")
        bs = ed["Sonar/Beam_group1"]["backscatter_r"]
        assert bs.sizes["range_sample"] == 21
        assert np.isfinite(np.asarray(bs.values, dtype="f8")).all()

    def test_mru_platform_differential(self, tmp_path):
        """MRU0 (pitch/roll/heave/heading on time2) and MRU1 (KMB lat/lon on
        time3) through the reference's set_platform vs our Platform group —
        values AND time coords must be array_equal.  The time coords pin our
        reference-exact f64 timestamp path (framing._ticks_to_datetime64):
        the reference's tick->seconds multiply wobbles up to ~2 us inside the
        microsecond digit (e.g. +100 ms offsets land on .099998)."""
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "MRU-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=4, n_samples=24, with_mru="both", seed=9)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={},
                                     sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        ref_p = sg.set_platform()
        our_p = ep.open_raw(str(raw), sonar_model="EK80")["Platform"]
        for tc in ("time2", "time3"):
            np.testing.assert_array_equal(
                np.asarray(our_p.coords[tc].values, dtype="datetime64[ns]"),
                np.asarray(ref_p.coords[tc].values, dtype="datetime64[ns]"))
        for var in ("pitch", "roll", "vertical_offset", "heading",
                    "latitude_mru1", "longitude_mru1"):
            np.testing.assert_array_equal(
                np.asarray(our_p[var].values, dtype="f8"),
                np.asarray(ref_p[var].values, dtype="f8"))

    def test_vendor_mixed_table_lengths_inverted(self, tmp_path):
        """INVERTED FINDING: the reference's set_vendor crashes when channels
        carry different pulse_duration table lengths —
        np.array(list-of-unequal-tables) raises on modern numpy
        (set_groups_ek80.py:1266).  The synth's BB channel has 5 entries vs
        3 on CW/GPT.  Ours NaN-pads every table to the longest."""
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "VND-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=3, n_samples=24)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={},
                                     sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        with pytest.raises(ValueError, match="inhomogeneous"):
            sg.set_vendor()

        vend = ep.open_raw(str(raw), sonar_model="EK80")["Vendor_specific"]
        pl = np.asarray(vend["pulse_length"].values, dtype="f8")
        assert pl.shape[-1] == 5  # padded to the BB channel's 5-entry table
        assert np.isnan(pl).any() and np.isfinite(pl[:, :3]).all()


class TestSetGroupsAZFPDifferential:
    """Reference ParseAZFP + SetGroupsAZFP vs our AZFP conversion
    (reference: parse_azfp.py, set_groups_azfp.py)."""

    @pytest.fixture(scope="class")
    def azfp_pair(self, tmp_path_factory):
        from synth_azfp import write_azfp_raw, write_azfp_xml_refcompat

        tmp = tmp_path_factory.mktemp("ref_setgroups_azfp")
        raw = tmp / "23010100.01A"
        xml = tmp / "cfg.xml"
        write_azfp_raw(raw, n_pings=10)
        write_azfp_xml_refcompat(xml)

        ref_parse = load_ref("convert/parse_azfp")
        parser = ref_parse.ParseAZFP(
            str(raw), file_meta=str(xml), storage_options={}, sonar_model="AZFP"
        )
        parser.parse_raw()
        ref_sg = load_ref("convert/set_groups_azfp")
        sg = ref_sg.SetGroupsAZFP(
            parser, input_file=str(raw), xml_path=str(xml), output_path=None,
            sonar_model="AZFP", params=dict(CONVERT_PARAMS),
        )
        groups = {
            "Sonar/Beam_group1": sg.set_beam()[0],
            "Environment": sg.set_env(),
            "Vendor_specific": sg.set_vendor(),
        }
        ed = ep.open_raw(str(raw), sonar_model="AZFP", xml_path=str(xml))
        return groups, ed

    def test_beam_group(self, azfp_pair):
        groups, ed = azfp_pair
        ref_b = groups["Sonar/Beam_group1"]
        our_b = ed["Sonar/Beam_group1"]
        for var in ("backscatter_r", "frequency_nominal",
                    "transmit_duration_nominal", "sample_interval"):
            if var in ref_b.data_vars and var in our_b.data_vars:
                _cmp(ref_b, our_b, var, rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_b.coords["ping_time"].values, dtype="datetime64[ns]"),
        )

    def test_environment_temperature(self, azfp_pair):
        groups, ed = azfp_pair
        _cmp(groups["Environment"], ed["Environment"], "temperature", rtol=1e-12)

    def test_vendor_cal_tables(self, azfp_pair):
        groups, ed = azfp_pair
        ref_v = groups["Vendor_specific"]
        our_v = ed["Vendor_specific"]
        for var in ("DS", "EL", "TVR", "VTX0", "Sv_offset",
                    "tilt_X_a", "tilt_X_b"):
            if var in ref_v.data_vars and var in our_v.data_vars:
                _cmp(ref_v, our_v, var, rtol=1e-12)


class TestSetGroupsAD2CPDifferential:
    """Reference ParseAd2cp + SetGroupsAd2cp vs our AD2CP conversion: the
    average and echosounder beam groups, Environment, and Platform
    (reference: parse_ad2cp.py, set_groups_ad2cp.py)."""

    @pytest.fixture(scope="class")
    def ad2cp_pair(self, tmp_path_factory):
        from test_ad2cp import write_ad2cp

        tmp = tmp_path_factory.mktemp("ref_setgroups_ad2cp")
        raw = tmp / "mooring.ad2cp"
        write_ad2cp(str(raw), n_pings=4)

        ref_parse = load_ref("convert/parse_ad2cp")
        parser = ref_parse.ParseAd2cp(
            str(raw), storage_options={}, sonar_model="AD2CP"
        )
        parser.parse_raw()
        ref_sg = load_ref("convert/set_groups_ad2cp")
        sg = ref_sg.SetGroupsAd2cp(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="AD2CP", params=dict(CONVERT_PARAMS),
        )
        groups = {
            "beams": sg.set_beam(),
            "Environment": sg.set_env(),
            "Platform": sg.set_platform(),
        }
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        return groups, ed

    def test_average_group(self, ad2cp_pair):
        groups, ed = ad2cp_pair
        ref_b = groups["beams"][0]
        our_b = ed["Sonar/Beam_group1"]
        for var in ("velocity", "amplitude", "correlation", "cell_size",
                    "blanking", "ambiguity_velocity"):
            if var in ref_b.data_vars and var in our_b.data_vars:
                _cmp(ref_b, our_b, var, rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_b.coords["ping_time"].values, dtype="datetime64[ns]"),
        )

    def test_echosounder_group(self, ad2cp_pair):
        groups, ed = ad2cp_pair
        ref_b = groups["beams"][1]
        our_b = ed["Sonar/Beam_group2"]
        # echosounder_frequency now included: our combine replicates the
        # reference's cross-packet zero-fill (value from the first packet at
        # each timestamp), so the full scalar set matches
        for var in ("amplitude", "cell_size", "blanking", "echosounder_frequency"):
            if var in ref_b.data_vars and var in our_b.data_vars:
                _cmp(ref_b, our_b, var, rtol=1e-12)

    def test_env_platform(self, ad2cp_pair):
        groups, ed = ad2cp_pair
        for var in ("sound_speed_indicative", "temperature", "pressure"):
            _cmp(groups["Environment"], ed["Environment"], var, rtol=1e-12)
        for var in ("heading", "pitch", "roll"):
            _cmp(groups["Platform"], ed["Platform"], var, rtol=1e-12)


class TestSetGroupsEK80PlatformNMEA:
    """EK80 Platform + NMEA groups vs the reference assembly."""

    def test_platform_and_nmea(self, tmp_path):
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "SGP80-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=6, n_samples=64)
        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={}, sonar_model="EK80")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(CONVERT_PARAMS),
        )
        ref_p = sg.set_platform()
        ref_n = sg.set_nmea()
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        our_p = ed["Platform"]
        # the FULL variable and coord sets must match — the reference always
        # materializes the MRU streams (time2/time3 + NaN-filled vars) even
        # when no MRU datagrams are present (set_groups_ek80.py:328-536)
        assert sorted(ref_p.data_vars) == sorted(our_p.data_vars)
        assert sorted(ref_p.coords) == sorted(our_p.coords)
        for var in sorted(ref_p.data_vars):
            if np.asarray(ref_p[var].values).dtype.kind in "fiu":
                _cmp(ref_p, our_p, var, rtol=1e-9)
        for coord in ("time1", "time2", "time3"):
            np.testing.assert_array_equal(
                np.asarray(our_p[coord].values), np.asarray(ref_p[coord].values)
            )
        np.testing.assert_array_equal(
            np.asarray(ed["Platform/NMEA"]["NMEA_datagram"].values),
            np.asarray(ref_n["NMEA_datagram"].values),
        )


class TestSetGroupsAD2CPRawGroup:
    """AD2CP echosounder-raw beam group (complex samples) vs the reference."""

    def test_raw_group(self, tmp_path):
        from test_ad2cp import write_ad2cp

        raw = tmp_path / "mraw.ad2cp"
        write_ad2cp(str(raw), n_pings=4, with_echosounder_raw=True)
        ref_parse = load_ref("convert/parse_ad2cp")
        parser = ref_parse.ParseAd2cp(str(raw), storage_options={}, sonar_model="AD2CP")
        parser.parse_raw()
        ref_sg = load_ref("convert/set_groups_ad2cp")
        sg = ref_sg.SetGroupsAd2cp(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="AD2CP", params=dict(CONVERT_PARAMS),
        )
        beams = sg.set_beam()
        ref_raw = next(
            b for b in beams if b is not None and "backscatter_r" in b.data_vars
        )
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        our_raw = ed["Sonar/Beam_group3"]
        for var in ("backscatter_r", "backscatter_i"):
            _cmp(ref_raw, our_raw, var, rtol=1e-12)


class TestSetGroupsAZFP6Differential:
    """Reference ParseAZFP6 + SetGroupsAZFP6 vs our AZFP6 conversion: beam
    and Environment groups.  (set_vendor is not executable on synthetic
    files: the reference's _check_uniqueness leaves profile_flag an empty
    list, which its own xr.Dataset construction cannot accept.)"""

    @pytest.fixture(scope="class")
    def azfp6_pair(self, tmp_path_factory):
        from test_azfp6 import write_azfp6_raw

        tmp = tmp_path_factory.mktemp("ref_setgroups_azfp6")
        raw = tmp / "23010100.azfp"
        write_azfp6_raw(str(raw), n_pings=6)

        ref_parse = load_ref("convert/parse_azfp6")
        parser = ref_parse.ParseAZFP6(
            str(raw), file_meta=None, storage_options={}, sonar_model="AZFP6"
        )
        parser.parse_raw()
        ref_sg = load_ref("convert/set_groups_azfp6")
        sg = ref_sg.SetGroupsAZFP6(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="AZFP6", params=dict(CONVERT_PARAMS),
        )
        groups = {
            "Sonar/Beam_group1": sg.set_beam()[0],
            "Environment": sg.set_env(),
        }
        ed = ep.open_raw(str(raw), sonar_model="AZFP6")
        return groups, ed

    def test_beam_group(self, azfp6_pair):
        groups, ed = azfp6_pair
        ref_b = groups["Sonar/Beam_group1"]
        our_b = ed["Sonar/Beam_group1"]
        for var in ("backscatter_r", "frequency_nominal"):
            if var in ref_b.data_vars and var in our_b.data_vars:
                _cmp(ref_b, our_b, var, rtol=1e-12)
        np.testing.assert_array_equal(
            np.asarray(our_b.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_b.coords["ping_time"].values, dtype="datetime64[ns]"),
        )

    def test_environment(self, azfp6_pair):
        groups, ed = azfp6_pair
        ref_e = groups["Environment"]
        our_e = ed["Environment"]
        for var in ("temperature", "pressure"):
            if var in ref_e.data_vars and var in our_e.data_vars:
                _cmp(ref_e, our_e, var, rtol=1e-9)


class TestSetGroupsAD2CPVendor:
    """AD2CP Vendor_specific sensor diagnostics vs the reference assembly."""

    def test_vendor_diagnostics(self, tmp_path):
        from test_ad2cp import write_ad2cp

        raw = tmp_path / "mv.ad2cp"
        write_ad2cp(str(raw), n_pings=5)
        ref_parse = load_ref("convert/parse_ad2cp")
        parser = ref_parse.ParseAd2cp(str(raw), storage_options={}, sonar_model="AD2CP")
        parser.parse_raw()
        ref_sg = load_ref("convert/set_groups_ad2cp")
        sg = ref_sg.SetGroupsAd2cp(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="AD2CP", params=dict(CONVERT_PARAMS),
        )
        ref_v = sg.set_vendor()
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        our_v = ed["Vendor_specific"]
        # exact row-for-row parity (round 4): one row per UNIQUE timestamp on
        # the time1 dim, first-packet-at-time selection with 0 padding
        # (reference set_groups_ad2cp.py:72-73,190-192)
        np.testing.assert_array_equal(
            np.asarray(our_v.coords["time1"].values, dtype="datetime64[ns]"),
            np.asarray(ref_v.coords["time1"].values, dtype="datetime64[ns]"),
        )
        for var in ("battery_voltage", "nominal_correlation", "power_level",
                    "magnetometer_temperature", "real_time_clock_temperature",
                    "ensemble_counter"):
            w = np.asarray(ref_v[var].values, dtype="f8")
            g = np.asarray(our_v[var].values, dtype="f8")
            assert ref_v[var].dims == our_v[var].dims == ("time1",), var
            assert g.shape == w.shape, var
            np.testing.assert_allclose(g, w, rtol=1e-12, err_msg=var)


def _run_ref_ad2cp(raw):
    """Execute the reference's full AD2CP conversion on the facade."""
    ref_parse = load_ref("convert/parse_ad2cp")
    parser = ref_parse.ParseAd2cp(str(raw), storage_options={}, sonar_model="AD2CP")
    parser.parse_raw()
    ref_sg = load_ref("convert/set_groups_ad2cp")
    return ref_sg.SetGroupsAd2cp(
        parser, input_file=str(raw), xml_path=None, output_path=None,
        sonar_model="AD2CP", params=dict(CONVERT_PARAMS),
    )


def _is_empty_var(da):
    return da.dims == () and (
        da.values is None or (np.asarray(da.values).ndim == 0
                              and np.asarray(da.values).dtype == object
                              and np.asarray(da.values).item() is None)
    )


def _cmp_full_group(ref_ds, our_ds, label, skip_vars=()):
    """Full-structure compare: var/coord SETS, dims name-for-name, values."""
    assert sorted(ref_ds.data_vars) == sorted(our_ds.data_vars), label
    assert sorted(ref_ds.coords) == sorted(our_ds.coords), label
    for var in sorted(ref_ds.data_vars):
        if var in skip_vars:
            continue
        w_da, g_da = ref_ds[var], our_ds[var]
        if _is_empty_var(w_da):
            assert _is_empty_var(g_da), f"{label}/{var}: ours not empty"
            continue
        assert tuple(w_da.dims) == tuple(g_da.dims), (
            f"{label}/{var}: {g_da.dims} vs {w_da.dims}"
        )
        _cmp(ref_ds, our_ds, var, rtol=1e-12)
    for coord in sorted(ref_ds.coords):
        w = np.asarray(ref_ds.coords[coord].values)
        g = np.asarray(our_ds.coords[coord].values)
        if w.dtype.kind == "M":
            w = w.astype("datetime64[ns]")
            g = g.astype("datetime64[ns]")
        if w.dtype.kind in ("U", "O", "S"):
            np.testing.assert_array_equal(
                g.astype(str), w.astype(str), err_msg=f"{label}/{coord}"
            )
        else:
            np.testing.assert_array_equal(g, w, err_msg=f"{label}/{coord}")


class TestAD2CPConfigSweepDifferential:
    """Randomized AD2CP config sweep through the reference's full conversion
    (ParseAd2cp -> SetGroupsAd2cp) vs our open_raw: burst records, 3-beam
    layouts, optional AHRS/altimeter/percentage-good/std-dev blocks, status
    bitfields, cross-packet ordering, and v2 records — comparing the FULL
    variable/coord sets (incl. the reference's empty `((), None)` variables)
    for every group.  This sweep is what surfaced the round-4 optional-field
    decode fixes (AST floats, AHRS f32, altimeter_raw sizes/scaling)."""

    CONFIGS = [
        ("burst", dict(average_id=0x15, with_echosounder=False,
                       record_kw=dict(num_beams=4, num_cells=16))),
        ("3beam_nocorr", dict(with_echosounder=False,
                              record_kw=dict(num_beams=3, num_cells=13,
                                             include_corr=False))),
        ("ahrs_pg_altraw", dict(with_echosounder=False,
                                record_kw=dict(with_ahrs=True,
                                               with_percentage_good=True,
                                               with_altimeter_raw=True,
                                               with_altimeter=True,
                                               status=0xD2345678,
                                               status0=0x8005))),
        ("echosounder_first", dict(echosounder_first=True)),
        ("bottom_track", dict(with_bottom_track=True)),
    ]

    @pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
    def test_all_groups_match_reference(self, tmp_path, name, cfg):
        from test_ad2cp import write_ad2cp

        raw = tmp_path / f"{name}.ad2cp"
        write_ad2cp(str(raw), n_pings=4, **cfg)
        sg = _run_ref_ad2cp(raw)
        ref_beams = sg.set_beam()
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        for i, ref_b in enumerate(ref_beams):
            _cmp_full_group(ref_b, ed[f"Sonar/Beam_group{i + 1}"], f"{name}/beam{i}")
        _cmp_full_group(sg.set_env(), ed["Environment"], f"{name}/env")
        _cmp_full_group(sg.set_platform(), ed["Platform"], f"{name}/platform",
                        skip_vars=())
        _cmp_full_group(sg.set_vendor(), ed["Vendor_specific"], f"{name}/vendor",
                        skip_vars=("altimeter_spare",))

    def test_ast_reference_vendor_crashes_ours_works(self, tmp_path):
        """Files carrying AST data: the reference's own set_vendor cannot
        represent the 8-byte altimeter_spare on a single time1 dim and
        raises from its Dataset construction; our vendor group emits it on
        ("time1", "spare") and everything else still matches for the
        non-vendor groups (documented deviation, set_groups_ad2cp.py
        module docstring)."""
        from test_ad2cp import write_ad2cp

        raw = tmp_path / "ast.ad2cp"
        write_ad2cp(str(raw), n_pings=3, with_echosounder=False,
                    record_kw=dict(with_ast=True, with_std_dev=True))
        sg = _run_ref_ad2cp(raw)
        ref_beams = sg.set_beam()
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        for i, ref_b in enumerate(ref_beams):
            _cmp_full_group(ref_b, ed[f"Sonar/Beam_group{i + 1}"], f"ast/beam{i}")
        _cmp_full_group(sg.set_env(), ed["Environment"], "ast/env")
        with pytest.raises(Exception):
            sg.set_vendor()
        our_v = ed["Vendor_specific"]
        assert our_v["altimeter_spare"].dims == ("time1", "spare")
        np.testing.assert_array_equal(
            np.asarray(our_v["altimeter_spare"].values)[0], np.arange(8)
        )
        np.testing.assert_allclose(
            np.asarray(our_v["ast_quality"].values, "f8"), 3.21
        )
        np.testing.assert_allclose(
            np.asarray(our_v["std_dev_roll"].values, "f8"), -0.34
        )

    def test_v2_file_reference_crashes_ours_works(self, tmp_path):
        """v2 burst/average records are DEAD CODE in the reference: its
        ``_read_data`` captures the VERSION3 field iterator before the
        version postprocess switches ``data_record_format``
        (parse_ad2cp.py:464-496, 603-607), so the first v2 record raises
        KeyError at the v3 altimeter predicate and ``parse_raw`` crashes
        the whole conversion.  Our parser implements the layout the
        reference's v2 format tables INTEND (parse_ad2cp.py:898-1100),
        with the optional include flags left absent so the corresponding
        vendor variables come out EMPTY like the v2 bitfield list implies
        (:611-619)."""
        from test_ad2cp import _packet, _string_packet, _v2_record

        raw = tmp_path / "v2.ad2cp"
        chunks = [_string_packet('GETCLOCKSTR,TIME="2021-04-02 06:30:00"\n')]
        for p in range(3):
            rec, _ = _v2_record(second=p, seed=p)
            chunks.append(_packet(0x16, rec))
        raw.write_bytes(b"".join(chunks))
        ref_parse = load_ref("convert/parse_ad2cp")
        parser = ref_parse.ParseAd2cp(
            str(raw), storage_options={}, sonar_model="AD2CP"
        )
        with pytest.raises(KeyError):
            parser.parse_raw()
        ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        bg = ed["Sonar/Beam_group1"]
        assert np.asarray(bg["velocity"].values).shape == (3, 4, 12)
        np.testing.assert_allclose(
            np.asarray(ed["Environment"]["temperature"].values, "f8"), 8.5
        )
        our_v = ed["Vendor_specific"]
        for var in ("ahrs_data_included", "ast_data_included",
                    "altimeter_distance", "std_dev_pitch"):
            assert _is_empty_var(our_v[var]), var
        # v2 records carry no nominal_correlation / ensemble_counter either
        assert _is_empty_var(our_v["nominal_correlation"])
        assert _is_empty_var(our_v["ensemble_counter"])


class TestESFamilyAliasDifferential:
    """ES70 / ES80 / EA640 model aliases (core.py SONAR_MODELS): the
    reference routes them through the EK60/EK80 machinery with the alias
    carried into Top-level keywords and the Sonar group
    (set_groups_base.py:57-73, set_groups_ek60.py:153, set_groups_ek80.py:200).
    Run the reference conversion under each alias on the same bytes our
    open_raw converts and compare the model-stamped metadata + beam data,
    then check the calibrate dispatch accepts the alias."""

    def _ek60_family_pair(self, tmp_path, model):
        raw = tmp_path / f"{model}-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=8, n_samples=40, with_nmea=True, with_angle=True)
        ref_parse = load_ref("convert/parse_ek60")
        parser = ref_parse.ParseEK60(str(raw), storage_options={}, sonar_model=model)
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek60")
        sg = ref_sg.SetGroupsEK60(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model=model, params=dict(CONVERT_PARAMS),
        )
        ed = ep.open_raw(str(raw), sonar_model=model)
        return sg, ed

    def test_es70_alias(self, tmp_path):
        sg, ed = self._ek60_family_pair(tmp_path, "ES70")
        top = sg.set_toplevel("ES70", date_created=np.datetime64("2020-01-01T00:00:00"))
        assert ed["Top-level"].attrs["keywords"] == top.attrs["keywords"] == "ES70"
        sonar = sg.set_sonar()
        for a in ("sonar_model", "sonar_manufacturer"):
            assert ed["Sonar"].attrs.get(a) == sonar.attrs.get(a), a
        beam = sg.set_beam()[0]
        _cmp(beam, ed["Sonar/Beam_group1"], "backscatter_r", rtol=1e-6, atol=1e-7)
        sv = ep.calibrate.compute_Sv(ed)  # CALIBRATOR maps ES70 -> EK60 path
        assert np.isfinite(np.asarray(sv["Sv"].values)).any()

    @pytest.mark.parametrize("model", ["ES80", "EA640"])
    def test_ek80_family_alias(self, tmp_path, model):
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / f"{model}-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=4, n_samples=48)
        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(str(raw), storage_options={}, sonar_model=model)
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model=model, params=dict(CONVERT_PARAMS),
        )
        ed = ep.open_raw(str(raw), sonar_model=model)
        top = sg.set_toplevel(model, date_created=np.datetime64("2021-02-01T00:00:00"))
        assert ed["Top-level"].attrs["keywords"] == top.attrs["keywords"] == model
        # the reference's SetGroupsEK80.set_sonar requires config fields the
        # synthetic XML omits (serial_number); the observable contract is the
        # alias stamped as the Sonar group's sonar_model
        # (set_groups_ek80.py:200-236 sonar_values)
        assert ed["Sonar"].attrs.get("sonar_model") == model
        sv = ep.calibrate.compute_Sv(
            ed, waveform_mode="BB", encode_mode="complex"
        )  # CALIBRATOR maps ES80/EA640 -> EK80 path
        assert np.isfinite(np.asarray(sv["Sv"].values)).any()


class TestEK60DropoutParity:
    """Per-channel ping dropouts through the reference chain: motion vars
    ride the FIRST channel's own rows (time2 = ping_time[ch0], raw values,
    reference set_groups_ek60.py:211-224,256-266), data_type/channel_mode
    promote to float64-with-NaN at uncovered pings (outer-join semantics),
    and a no-NMEA file yields a float-NaN sentence_type
    (set_groups_base.py:218-222).  Found by the ek60sg soak."""

    @pytest.fixture(scope="class")
    def dropout_pair(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ek60_dropout")
        raw = tmp / "DO-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=9, n_samples=30, with_nmea=False,
                       jitter_raw0=True, jitter_config=True,
                       skip_pings={1: {2, 5}})
        ref_parse = load_ref("convert/parse_ek60")
        parser = ref_parse.ParseEK60(str(raw), storage_options={},
                                     sonar_model="EK60")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek60")
        sg = ref_sg.SetGroupsEK60(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK60", params=dict(CONVERT_PARAMS),
        )
        ed = ep.open_raw(str(raw), sonar_model="EK60")
        return sg, ed

    def test_platform_motion_first_channel_rows(self, dropout_pair):
        sg, ed = dropout_pair
        ref_p = sg.set_platform()
        our_p = ed["Platform"]
        # channel 1 skipped 2 pings -> 7 rows, NOT the 9-ping union grid
        assert our_p.sizes["time2"] == 7
        np.testing.assert_array_equal(
            np.asarray(our_p.coords["time2"].values, dtype="datetime64[ns]"),
            np.asarray(ref_p.coords["time2"].values, dtype="datetime64[ns]"))
        for var in ("pitch", "roll", "vertical_offset"):
            np.testing.assert_array_equal(
                np.asarray(our_p[var].values, dtype="f8"),
                np.asarray(ref_p[var].values, dtype="f8"))

    def test_empty_nmea_sentence_type_nan(self, dropout_pair):
        _, ed = dropout_pair
        st = np.asarray(ed["Platform"]["sentence_type"].values)
        assert st.dtype.kind == "f" and np.isnan(st).all()

    def test_data_type_nan_promotion(self, dropout_pair):
        sg, ed = dropout_pair
        ref_b = sg.set_beam()[0]
        our_b = ed["Sonar/Beam_group1"]
        for var in ("data_type", "channel_mode"):
            w = np.asarray(ref_b[var].values, dtype="f8")
            g = np.asarray(our_b[var].values, dtype="f8")
            assert np.isnan(g).sum() == 2 * 1  # ch1's two skipped pings
            np.testing.assert_array_equal(np.isnan(w), np.isnan(g))
            np.testing.assert_array_equal(np.nan_to_num(w), np.nan_to_num(g))
