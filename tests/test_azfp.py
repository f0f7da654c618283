"""AZFP conversion + calibration tests."""

import numpy as np
import pytest

import echopype_tpu as ep

from synth_azfp import write_azfp_raw, write_azfp_xml, FREQS_KHZ, NUM_BINS


@pytest.fixture(scope="module")
def azfp_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("azfp")
    raw = tmp / "21031500.01A"
    xml = tmp / "instrument.XML"
    write_azfp_xml(xml)
    truth = write_azfp_raw(raw, n_pings=5)
    ed = ep.open_raw(raw, sonar_model="AZFP", xml_path=str(xml))
    return ed, truth


class TestAZFPConvert:
    def test_tree(self, azfp_ed):
        ed, truth = azfp_ed
        for g in ["Environment", "Platform", "Sonar", "Sonar/Beam_group1", "Vendor_specific"]:
            assert g in ed.group_paths
        assert ed.sonar_model == "AZFP"

    def test_counts_and_channel_sorting(self, azfp_ed):
        ed, truth = azfp_ed
        beam = ed["Sonar/Beam_group1"]
        bs = beam["backscatter_r"]
        assert bs.shape == (2, 5, NUM_BINS)
        # channels sorted by frequency: 38 kHz first
        np.testing.assert_allclose(
            beam["frequency_nominal"].values, [38000.0, 125000.0]
        )
        # 38 kHz is source channel index 1
        expected_38 = np.stack([t[1] for t in truth["counts"]])
        np.testing.assert_allclose(bs.values[0], expected_38)

    def test_vendor_params(self, azfp_ed):
        ed, truth = azfp_ed
        vend = ed["Vendor_specific"]
        # sorted: 38 kHz (src idx 1) first
        np.testing.assert_allclose(vend["EL"].values, [140.2, 142.1])
        np.testing.assert_allclose(vend["DS"].values, [0.0242, 0.0246])
        np.testing.assert_allclose(vend["TVR"].values, [167.3, 169.8])
        np.testing.assert_allclose(vend["VTX0"].values, [90.1, 88.2])
        # Sv offsets: 38 kHz @500us -> 1.1; 125 kHz @300us -> 1.1
        np.testing.assert_allclose(vend["Sv_offset"].values, [1.1, 1.1])

    def test_ping_time(self, azfp_ed):
        ed, truth = azfp_ed
        pt = ed["Sonar/Beam_group1"].coords["ping_time"].values
        np.testing.assert_array_equal(pt, np.asarray(truth["time"]))

    def test_environment_temperature(self, azfp_ed):
        ed, truth = azfp_ed
        env = ed["Environment"]
        t = env["temperature"].values
        assert np.isfinite(t).all()

    def test_requires_xml(self, tmp_path):
        raw = tmp_path / "x.01A"
        raw.write_bytes(b"")
        with pytest.raises(ValueError):
            ep.open_raw(raw, sonar_model="AZFP")


class TestAZFPCalibrate:
    def test_sv_matches_manual_formula(self, azfp_ed):
        ed, truth = azfp_ed
        ds = ep.calibrate.compute_Sv(
            ed, env_params={"salinity": 33.0, "pressure": 10.0}
        )
        sv = ds["Sv"].values
        assert sv.shape == (2, 5, NUM_BINS)
        assert np.isfinite(sv).all()

        # float64 oracle for the 38 kHz channel (sorted index 0)
        from echopype_tpu.utils import uwa

        temp = ed["Environment"]["temperature"].values  # [time1]
        c = uwa.calc_sound_speed(temp, 33.0, 10.0, formula_source="AZFP")
        alpha = uwa.calc_absorption(
            38000.0, temp, 33.0, 10.0, formula_source="AZFP"
        )
        EL0, DS0, TVR0, VTX0 = 140.2, 0.0242, 167.3, 90.1
        BP0 = 0.0088
        tdn = 500e-6
        N_pb, f_dig, L = 4, 64000.0, 8.0
        k = np.arange(NUM_BINS)
        counts = np.stack([t[1] for t in truth["counts"]])  # [ping, bins]
        c_pp = c[:, None]
        rng = (
            c_pp * L / (2 * f_dig)
            + (c_pp / 4) * (((2 * (k + 1) - 1) * N_pb - 1) / f_dig + tdn)[None, :]
        )
        SL = TVR0 + 20 * np.log10(VTX0)
        EL = EL0 - 2.5 / DS0 + counts / (26214 * DS0)
        expected = (
            EL
            - SL
            + 20 * np.log10(rng)
            + 2 * alpha[:, None] * rng
            - 10 * np.log10(0.5 * c_pp * tdn * BP0)
            + 1.1
        )
        np.testing.assert_allclose(sv[0], expected, atol=1e-6, rtol=0)

    def test_ts(self, azfp_ed):
        ed, truth = azfp_ed
        ds = ep.calibrate.compute_TS(ed, env_params={"salinity": 33.0, "pressure": 10.0})
        assert "TS" in ds and np.isfinite(ds["TS"].values).all()

    def test_requires_salinity_pressure(self, azfp_ed):
        ed, truth = azfp_ed
        with pytest.raises(ReferenceError):
            ep.calibrate.compute_Sv(ed)
