"""EK60 conversion tests: byte-exact synthetic .raw -> EchoData tree."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.convert.simrad import framing
from echopype_tpu.convert.simrad.decode import INDEX2POWER

from synth_ek60 import write_ek60_raw


@pytest.fixture()
def raw_file(tmp_path):
    path = tmp_path / "TEST-D20200101-T000000.raw"
    truth = write_ek60_raw(path, n_pings=12, n_samples=40)
    return path, truth


class TestFraming:
    def test_scan_counts(self, raw_file):
        path, truth = raw_file
        index = framing.scan_datagrams(path.read_bytes())
        assert (index.dgram_type == "CON0").sum() == 1
        assert (index.dgram_type == "RAW0").sum() == 12 * 2
        assert (index.dgram_type == "NME0").sum() == 6

    def test_timestamps_roundtrip(self, raw_file):
        path, truth = raw_file
        index = framing.scan_datagrams(path.read_bytes())
        raws = index.select("RAW0")
        t_expected = np.datetime64("2020-01-01T00:00:01", "ns")
        assert index.timestamp[raws[0]] == t_expected

    def test_resync_after_corruption(self, raw_file):
        path, truth = raw_file
        buf = bytearray(path.read_bytes())
        # corrupt some bytes in the middle of the file between datagrams
        buf[500:504] = b"\xde\xad\xbe\xef"
        index = framing.scan_datagrams(bytes(buf))
        # should still find most datagrams
        assert (index.dgram_type == "RAW0").sum() >= 20


class TestOpenRaw:
    def test_tree_structure(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        for grp in [
            "Top-level",
            "Environment",
            "Platform",
            "Platform/NMEA",
            "Provenance",
            "Sonar",
            "Sonar/Beam_group1",
            "Vendor_specific",
        ]:
            assert grp in ed.group_paths, grp
        assert ed.sonar_model == "EK60"
        assert ed["Top-level"].attrs["keywords"] == "EK60"
        assert ed["Top-level"].attrs["processing_level"] == "Level 1A"

    def test_backscatter_values_exact(self, raw_file):
        """power = raw int16 * INDEX2POWER, channels sorted by channel_id."""
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        beam = ed["Sonar/Beam_group1"]
        bs = beam["backscatter_r"]
        assert bs.dims == ("channel", "ping_time", "range_sample")
        assert bs.shape == (2, 12, 40)
        # channel order: sorted channel_id strings -> 18 kHz first
        chans = beam.coords["channel"].values.tolist()
        assert chans[0].startswith("GPT  18")
        for ci, src_ch in enumerate([1, 2]):
            expected = np.stack(truth["power_idx"][src_ch]).astype("f4") * np.float32(INDEX2POWER)
            np.testing.assert_allclose(bs.values[ci], expected, rtol=1e-6)

    def test_angle_split(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        beam = ed["Sonar/Beam_group1"]
        athwart = beam["angle_athwartship"].values
        along = beam["angle_alongship"].values
        for ci, src_ch in enumerate([1, 2]):
            expected = np.stack(truth["angle"][src_ch]).astype("f4")
            np.testing.assert_array_equal(athwart[ci], expected[:, :, 0])
            np.testing.assert_array_equal(along[ci], expected[:, :, 1])

    def test_ping_params(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        beam = ed["Sonar/Beam_group1"]
        np.testing.assert_allclose(beam["sample_interval"].values, 256e-6, rtol=1e-6)
        np.testing.assert_allclose(beam["transmit_duration_nominal"].values, 1024e-6, rtol=1e-6)
        np.testing.assert_allclose(beam["transmit_power"].values[0], 1900.0)
        np.testing.assert_allclose(beam["transmit_power"].values[1], 1800.0)

    def test_vendor_tables(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        vend = ed["Vendor_specific"]
        assert vend["pulse_length"].dims == ("channel", "pulse_length_bin")
        np.testing.assert_allclose(
            vend["pulse_length"].values[0], [256e-6, 512e-6, 1024e-6, 2048e-6, 4096e-6]
        )
        np.testing.assert_allclose(vend["sa_correction"].values[0], [0.0, -0.1, -0.2, -0.3, -0.4])
        np.testing.assert_allclose(vend["gain_correction"].values[1], [22, 23, 24, 25, 26])

    def test_environment(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        env = ed["Environment"]
        np.testing.assert_allclose(env["sound_speed_indicative"].values, 1480.0)
        np.testing.assert_allclose(env["absorption_indicative"].values, 0.0098, rtol=1e-6)

    def test_platform_nmea_latlon(self, raw_file):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        plat = ed["Platform"]
        lat = plat["latitude"].values
        lon = plat["longitude"].values
        assert len(lat) == 6
        np.testing.assert_allclose(lat[0], 30 + 0.5 / 60, rtol=1e-6)
        assert np.all(lon < 0)  # western hemisphere
        nmea = ed["Platform/NMEA"]
        assert nmea["NMEA_datagram"].values[0].startswith("$GPGGA")

    def test_ragged_pings_padded(self, tmp_path):
        path = tmp_path / "RAG-D20200101-T000000.raw"
        truth = write_ek60_raw(path, n_pings=9, n_samples=40, ragged=True)
        ed = ep.open_raw(path, sonar_model="EK60")
        bs = ed["Sonar/Beam_group1"]["backscatter_r"]
        assert bs.shape == (2, 9, 40)
        # ping 1 has 35 samples -> tail NaN
        assert np.isnan(bs.values[0, 1, 35:]).all()
        assert not np.isnan(bs.values[0, 1, :35]).any()

    def test_zarr_roundtrip(self, raw_file, tmp_path):
        path, truth = raw_file
        ed = ep.open_raw(path, sonar_model="EK60")
        store = tmp_path / "ek60.zarr"
        ed.to_zarr(store)
        ed2 = ep.open_converted(store)
        assert set(ed2.group_paths) == set(ed.group_paths)
        np.testing.assert_allclose(
            ed2["Sonar/Beam_group1"]["backscatter_r"].values,
            ed["Sonar/Beam_group1"]["backscatter_r"].values,
        )
        np.testing.assert_array_equal(
            ed2["Sonar/Beam_group1"].coords["ping_time"].values,
            ed["Sonar/Beam_group1"].coords["ping_time"].values,
        )
        assert ed2.sonar_model == "EK60"

    def test_wrong_extension(self, tmp_path):
        bad = tmp_path / "file.01A"
        bad.write_bytes(b"xx")
        with pytest.raises(ValueError):
            ep.open_raw(bad, sonar_model="EK60")

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            ep.open_raw("/nonexistent.raw", sonar_model="EK60")


class TestUseSwap:
    def test_swap_spills_and_cleans(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "L0042-D20200101-T000000-EK60.raw"
        truth = write_ek60_raw(raw, n_pings=8, n_samples=400)
        ed_mem = ep.open_raw(raw, sonar_model="EK60", use_swap=False)
        ed = ep.open_raw(raw, sonar_model="EK60", use_swap=True)
        import numpy as _np

        bs = ed["Sonar/Beam_group1"].data_vars["backscatter_r"]
        assert isinstance(bs.values, _np.memmap)
        assert ed.swap_files and all(f.exists() for f in ed.swap_files)
        _np.testing.assert_array_equal(
            bs.values, ed_mem["Sonar/Beam_group1"]["backscatter_r"].values
        )
        # zarr write reads through the memmap
        ed.to_zarr(tmp_path / "swap.zarr")
        ed2 = ep.open_converted(tmp_path / "swap.zarr")
        _np.testing.assert_array_equal(
            ed2["Sonar/Beam_group1"]["backscatter_r"].values, _np.asarray(bs.values)
        )
        swap_dir = ed.swap_dir
        ed.cleanup_swap_files()
        assert not swap_dir.exists()
        # data still usable after cleanup (copied back to RAM)
        assert _np.isfinite(ed["Sonar/Beam_group1"]["backscatter_r"].values).any()

    def test_swap_auto_small_file_stays_in_memory(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "L0043-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        ed = ep.open_raw(raw, sonar_model="EK60", use_swap="auto")
        assert getattr(ed, "swap_dir", None) is None

    def test_swap_invalid_value_raises(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "L0044-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="use_swap"):
            ep.open_raw(raw, sonar_model="EK60", use_swap="always")


class TestConvertParams:
    def test_platform_identity_attrs(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "P1-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        ed = ep.open_raw(raw, sonar_model="EK60",
                         convert_params={"platform_name": "RV Oscar Dyson",
                                         "platform_type": "research vessel",
                                         "platform_code_ICES": "315"})
        plat = ed["Platform"]
        assert plat.attrs["platform_name"] == "RV Oscar Dyson"
        assert plat.attrs["platform_type"] == "research vessel"
        assert plat.attrs["platform_code_ICES"] == "315"
        # defaults when not supplied
        ed2 = ep.open_raw(raw, sonar_model="EK60")
        assert ed2["Platform"].attrs["platform_name"] == ""

    def test_water_level_and_extra_keys(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "P2-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        ed = ep.open_raw(raw, sonar_model="EK60",
                         convert_params={"water_level": 3.25, "cruise_id": "DY2004"})
        assert float(ed["Platform"]["water_level"].values) == 3.25
        assert ed["Top-level"].attrs["cruise_id"] == "DY2004"
        # without override, transducer depth from the raw file is used
        ed2 = ep.open_raw(raw, sonar_model="EK60")
        assert float(ed2["Platform"]["water_level"].values) != 3.25


class TestCorruptionFuzz:
    def test_random_corruption_never_crashes(self, tmp_path):
        """Deterministic fuzz: byte flips / truncations / insertions anywhere
        in the stream must at worst drop pings, never raise."""
        from synth_ek60 import write_ek60_raw

        base = tmp_path / "F-D20200101-T000000-EK60.raw"
        write_ek60_raw(base, n_pings=6, n_samples=30)
        clean = base.read_bytes()
        rng = np.random.default_rng(123)
        for trial in range(12):
            buf = bytearray(clean)
            mode = trial % 3
            if mode == 0:  # flip a run of bytes
                pos = int(rng.integers(0, len(buf) - 16))
                for i in range(int(rng.integers(1, 12))):
                    buf[pos + i] ^= 0xFF
            elif mode == 1:  # truncate
                buf = buf[: int(rng.integers(len(buf) // 2, len(buf)))]
            else:  # insert garbage mid-stream
                pos = int(rng.integers(0, len(buf)))
                buf[pos:pos] = bytes(rng.integers(0, 256, int(rng.integers(3, 64)), dtype="u1"))
            fpath = tmp_path / f"fuzz{trial}-D20200101-T000000-EK60.raw"
            fpath.write_bytes(bytes(buf))
            try:
                ed = ep.open_raw(fpath, sonar_model="EK60")
                # whatever survived must still be a coherent tree
                assert "Sonar" in ed.group_paths
            except ValueError:
                pass  # acceptable: unrecoverable stream (e.g. CON0 destroyed)


class TestUnionGridScatter:
    """The np.empty + targeted-NaN-fill scatter (set_groups_ek60.set_beam)
    must leave NaN exactly where the old NaN-prefill did: missing union rows
    (a channel skipping pings) and per-channel shorter range tails."""

    def test_missing_pings_and_unequal_ranges(self, tmp_path):
        path = tmp_path / "UG-D20200101-T000000.raw"
        write_ek60_raw(
            path, n_pings=8, n_samples=40,
            skip_pings={2: {1, 4, 5}}, per_channel_samples=(40, 25),
        )
        ed = ep.open_raw(path, sonar_model="EK60")
        bs = ed["Sonar/Beam_group1"]["backscatter_r"].values
        ang = ed["Sonar/Beam_group1"]["angle_athwartship"].values
        assert bs.shape == (2, 8, 40)
        # channel 2 (sorted second) skipped pings 1/4/5: full-NaN rows
        for p in range(8):
            if p in (1, 4, 5):
                assert np.isnan(bs[1, p]).all()
                assert np.isnan(ang[1, p]).all()
            else:
                assert not np.isnan(bs[1, p, :25]).any()
                assert np.isnan(bs[1, p, 25:]).all()  # short-range tail
                assert np.isnan(ang[1, p, 25:]).all()
        # channel 1 present everywhere at full range
        assert not np.isnan(bs[0]).any()
