"""EK80 conversion tests: synthetic .raw -> EchoData tree with 3 beam groups."""

import numpy as np
import pytest

import echopype_tpu as ep

from synth_ek80 import CH_BB, CH_CW, CH_PW, write_ek80_raw


@pytest.fixture(scope="module")
def ek80_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ek80")
    path = tmp / "E80-D20210201-T000000.raw"
    truth = write_ek80_raw(path, n_pings=6, n_samples=64)
    ed = ep.open_raw(path, sonar_model="EK80")
    return ed, truth


class TestEK80Convert:
    def test_beam_groups_split(self, ek80_ed):
        ed, truth = ek80_ed
        sonar = ed["Sonar"]
        descr = [str(x) for x in sonar["waveform_encode_descr"].values]
        assert descr == ["complex_FM", "complex_CW", "power"]
        assert "Sonar/Beam_group1" in ed.group_paths
        assert "Sonar/Beam_group2" in ed.group_paths
        assert "Sonar/Beam_group3" in ed.group_paths

    def test_complex_fm_values(self, ek80_ed):
        ed, truth = ek80_ed
        bg1 = ed["Sonar/Beam_group1"]
        assert bg1["backscatter_r"].dims == ("channel", "ping_time", "range_sample", "beam")
        assert bg1.sizes["beam"] == 4
        expected = np.stack(truth["complex"][CH_BB])  # [ping, range, sector]
        np.testing.assert_allclose(
            bg1["backscatter_r"].values[0], expected.real, rtol=1e-6
        )
        np.testing.assert_allclose(
            bg1["backscatter_i"].values[0], expected.imag, rtol=1e-6
        )
        # FM transmit params
        np.testing.assert_allclose(bg1["transmit_frequency_start"].values, 50000.0)
        np.testing.assert_allclose(bg1["transmit_frequency_stop"].values, 90000.0)
        assert str(bg1["transmit_type"].values[0, 0]) == "LFM"

    def test_complex_cw_group(self, ek80_ed):
        ed, truth = ek80_ed
        bg2 = ed["Sonar/Beam_group2"]
        assert list(bg2.coords["channel"].values) == [CH_CW]
        # CW-complex groups carry no frequency ramp vars (the raw CW pings
        # have no frequency_start/end; reference set_groups_ek80.py:753-790)
        assert "transmit_frequency_start" not in bg2.data_vars
        assert str(bg2["transmit_type"].values[0, 0]) == "CW"

    def test_power_group(self, ek80_ed):
        ed, truth = ek80_ed
        bg3 = ed["Sonar/Beam_group3"]
        assert list(bg3.coords["channel"].values) == [CH_PW]
        from echopype_tpu.convert.simrad.decode import INDEX2POWER

        expected = np.stack(truth["power"][CH_PW]).astype("f4") * np.float32(INDEX2POWER)
        np.testing.assert_allclose(bg3["backscatter_r"].values[0], expected, rtol=1e-6)
        assert "angle_athwartship" in bg3

    def test_vendor_tables_and_filters(self, ek80_ed):
        ed, truth = ek80_ed
        vend = ed["Vendor_specific"]
        assert list(vend.coords["channel"].values) == sorted([CH_BB, CH_CW, CH_PW])
        # transceiver types recorded
        ttypes = {str(c): str(t) for c, t in zip(vend.coords["channel"].values,
                                                 vend["transceiver_type"].values)}
        assert ttypes[CH_PW] == "GPT" and ttypes[CH_BB] == "WBT"
        # pulse tables: BB channel row
        bb_i = list(vend.coords["channel"].values).index(CH_BB)
        np.testing.assert_allclose(
            vend["pulse_length"].values[bb_i], [256e-6, 512e-6, 1024e-6, 2048e-6, 4096e-6]
        )
        # filters present with decimation
        assert "WBT_coeffs_real" in vend and "PC_coeffs_real" in vend
        wbt_deci = vend["WBT_deci_fac"].values
        assert np.nanmax(wbt_deci) == 6.0
        wbt_re = vend["WBT_coeffs_real"].values
        np.testing.assert_allclose(wbt_re[bb_i, 0, :4], 0.25)
        # broadband cal curve interpolable at center freq
        assert "cal_frequency" in vend.coords
        assert "gain" in vend
        gain_bb = vend["gain"].values[list(vend.coords["cal_channel_id"].values).index(CH_BB)]
        assert np.nanmin(gain_bb) >= 26.0 and np.nanmax(gain_bb) <= 28.0

    def test_environment(self, ek80_ed):
        ed, truth = ek80_ed
        env = ed["Environment"]
        np.testing.assert_allclose(float(env["temperature"].values), 9.0)
        np.testing.assert_allclose(float(env["salinity"].values), 33.5)
        np.testing.assert_allclose(float(env["depth"].values), 100.0)
        np.testing.assert_allclose(float(env["acidity"].values), 8.06)
        np.testing.assert_allclose(float(env["sound_speed_indicative"].values), 1480.0)

    def test_zarr_roundtrip(self, ek80_ed, tmp_path):
        ed, truth = ek80_ed
        store = tmp_path / "ek80.zarr"
        ed.to_zarr(store)
        ed2 = ep.open_converted(store)
        assert set(ed2.group_paths) == set(ed.group_paths)
        np.testing.assert_allclose(
            ed2["Sonar/Beam_group1"]["backscatter_r"].values,
            ed["Sonar/Beam_group1"]["backscatter_r"].values,
        )

    def test_beam_group_retrieval(self, ek80_ed):
        ed, truth = ek80_ed
        from echopype_tpu.echodata.simrad import retrieve_correct_beam_group

        assert retrieve_correct_beam_group(ed, "BB", "complex") == "Sonar/Beam_group1"
        assert retrieve_correct_beam_group(ed, "CW", "complex") == "Sonar/Beam_group2"
        assert retrieve_correct_beam_group(ed, "CW", "power") == "Sonar/Beam_group3"


class TestRaw4TransmitPulse:
    def test_transmit_pulse_in_beam_group(self, tmp_path):
        import numpy as _np
        from synth_ek60 import make_nme0
        from synth_ek80 import (
            default_channels, config_xml, environment_xml, make_fil1,
            make_raw3, make_raw4, make_xml0, parameter_xml, CH_BB,
        )

        rng = _np.random.default_rng(3)
        channels = [c for c in default_channels() if c["id"] == CH_BB]
        t0 = _np.datetime64("2021-02-01T00:00:00", "ns")
        chunks = [make_xml0(t0, config_xml(channels)), make_xml0(t0, environment_xml())]
        chunks.append(make_fil1(t0, CH_BB, 1, _np.full(4, 0.25, dtype="c8"), 6))
        chunks.append(make_fil1(t0, CH_BB, 2, _np.full(2, 0.5, dtype="c8"), 1))
        tx_truth = []
        for p in range(3):
            ts = t0 + _np.timedelta64(p + 1, "s")
            chunks.append(make_xml0(ts, parameter_xml(
                CH_BB, 1, freq_start=50000.0, freq_end=90000.0, sample_interval=16e-6)))
            txp = (rng.normal(0, 1, (20, 1)) + 1j * rng.normal(0, 1, (20, 1))).astype("c8")
            chunks.append(make_raw4(ts, CH_BB, txp))
            cs = (rng.normal(0, 1e-3, (64, 4)) + 1j * rng.normal(0, 1e-3, (64, 4))).astype("c8")
            chunks.append(make_raw3(ts, CH_BB, complex_samples=cs))
            tx_truth.append(txp[:, 0])
        path = tmp_path / "R4-D20210201-T000000.raw"
        path.write_bytes(b"".join(chunks))
        ed = ep.open_raw(path, sonar_model="EK80")
        bg = ed["Sonar/Beam_group1"]
        assert "transmit_pulse_r" in bg and "transmit_pulse_i" in bg
        tp = bg["transmit_pulse_r"].values
        assert tp.shape == (1, 3, 20)
        _np.testing.assert_allclose(tp[0, 0], tx_truth[0].real, rtol=1e-6)


class TestUnionGridScatterEK80:
    """np.empty + targeted NaN fill in the EK80 group builders must leave
    NaN on union rows where a channel skipped pings."""

    def test_complex_missing_rows(self, tmp_path):
        from synth_ek80 import default_channels

        path = tmp_path / "UG80-D20210201-T000000.raw"
        bb_id = default_channels()[0]["id"]
        # two FM channels share the complex-FM group; the first skips pings
        # 2/3 so the group union has rows it never covers
        write_ek80_raw(path, n_pings=6, skip_pings={bb_id: {2, 3}},
                       extra_fm_channel=True)
        ed = ep.open_raw(path, sonar_model="EK80")
        hit = False
        for g in ("Sonar/Beam_group1", "Sonar/Beam_group2", "Sonar/Beam_group3"):
            try:
                ds = ed[g]
            except (KeyError, AttributeError):
                continue
            if ds is None or "backscatter_i" not in ds:
                continue
            chans = list(ds.coords["channel"].values)
            if bb_id not in chans or len(chans) < 2:
                continue
            ci = chans.index(bb_id)
            bs = ds["backscatter_r"].values
            assert bs.shape[1] == 6  # union spans all pings via the 2nd FM
            assert np.isnan(bs[ci, 2]).all() and np.isnan(bs[ci, 3]).all()
            assert not np.isnan(bs[ci, 0]).all()
            other = 1 - ci if len(chans) == 2 else next(
                j for j in range(len(chans)) if j != ci
            )
            assert not np.isnan(bs[other, 2]).all()
            hit = True
        assert hit, "expected a 2-channel complex-FM group"


class TestFloat16Complex:
    """RAW3 float16 complex samples (data_type bit2): 2x f16 per complex value.

    The reference's f16 branch (ek_raw_parsers.py:1746-1765) mis-sizes the
    block at 2 bytes/complex and reinterprets the f16 buffer as complex64;
    we decode per the datagram layout instead (see simrad/decode.py).
    """

    def test_f16_decode_matches_truth(self, tmp_path):
        path = tmp_path / "E80f16-D20210201-T000000.raw"
        truth = write_ek80_raw(
            path, n_pings=4, n_samples=32,
            with_power_channel=False, with_cw_complex=False, complex_f16=True,
        )
        ed = ep.open_raw(path, sonar_model="EK80")
        bg1 = ed["Sonar/Beam_group1"]
        expected = np.stack(truth["complex"][CH_BB])  # f16-quantized truth
        np.testing.assert_allclose(bg1["backscatter_r"].values[0], expected.real, rtol=1e-6)
        np.testing.assert_allclose(bg1["backscatter_i"].values[0], expected.imag, rtol=1e-6)

    def test_f16_calibrates(self, tmp_path):
        path = tmp_path / "E80f16b-D20210201-T000000.raw"
        write_ek80_raw(
            path, n_pings=4, n_samples=64,
            with_power_channel=False, with_cw_complex=False, complex_f16=True,
        )
        ed = ep.open_raw(path, sonar_model="EK80")
        sv = ep.calibrate.compute_Sv(ed, waveform_mode="BB", encode_mode="complex")
        v = sv["Sv"].values
        assert np.isfinite(v).any()
