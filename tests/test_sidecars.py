"""BOT/IDX sidecar tests: seafloor depths -> Vendor, index data -> Platform."""

import struct

import numpy as np

import echopype_tpu as ep

from synth_ek60 import dt64_to_nt, frame, write_ek60_raw
from synth_ek80 import write_ek80_raw


def make_bot0(timestamp, depths):
    low, high = dt64_to_nt(timestamp)
    d = np.asarray(depths, dtype="<f8")
    body = struct.pack("<4sLLL", b"BOT0", low, high, len(d)) + d.tobytes()
    return frame(body)


def make_idx0(timestamp, ping_number, distance, lat, lon, file_offset):
    low, high = dt64_to_nt(timestamp)
    body = struct.pack(
        "<4sLLLdddL", b"IDX0", low, high, ping_number, distance, lat, lon, file_offset
    )
    return frame(body)


def write_sidecars(raw_path, t0, n, n_chan):
    """Realistic sidecar streams: like instrument-written .bot/.idx files,
    each starts with a CON0 configuration datagram (the reference skips the
    first datagram unconditionally, parse_base.py:398-407; our parser
    selects by datagram type)."""
    from synth_ek60 import make_con0

    con = make_con0(t0, [{"channel_id": f"CH{k}", "frequency": 38000.0}
                         for k in range(n_chan)])
    rng = np.random.default_rng(7)
    depth_truth = rng.uniform(50, 500, (n, n_chan))
    bot = con + b"".join(
        make_bot0(t0 + np.timedelta64(p + 1, "s"), depth_truth[p]) for p in range(n)
    )
    raw_path.with_suffix(".bot").write_bytes(bot)
    idx = con + b"".join(
        make_idx0(
            t0 + np.timedelta64(p + 1, "s"), p + 1, 0.01 * p, 44.0 + 0.001 * p,
            -125.0 - 0.001 * p, 4096 * p,
        )
        for p in range(n)
    )
    raw_path.with_suffix(".idx").write_bytes(idx)
    return depth_truth


class TestEK60Sidecars:
    def test_bot_and_idx(self, tmp_path):
        raw = tmp_path / "L0001-D20200101-T000000-EK60.raw"
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        write_ek60_raw(raw, n_pings=5, n_samples=20, t0=t0)
        depth_truth = write_sidecars(raw, t0, n=5, n_chan=2)

        ed = ep.open_raw(raw, sonar_model="EK60", include_bot=True, include_idx=True)
        vend = ed["Vendor_specific"]
        # reference dims: BOT depths ride their own ping_time coordinate in
        # the Vendor group (set_groups_base.py:500-506)
        assert vend["detected_seafloor_depth"].dims == ("channel", "ping_time")
        np.testing.assert_allclose(
            vend["detected_seafloor_depth"].values, depth_truth.T
        )
        assert vend.coords["ping_time"].values[0] == t0 + np.timedelta64(1, "s")
        plat = ed["Platform"]
        np.testing.assert_allclose(plat["ping_number_idx"].values, np.arange(1, 6))
        np.testing.assert_allclose(plat["latitude_idx"].values[2], 44.002)
        np.testing.assert_allclose(plat["vessel_distance_idx"].values[3], 0.03)

    def test_missing_sidecar_raises(self, tmp_path):
        raw = tmp_path / "L0002-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        import pytest

        with pytest.raises(FileNotFoundError):
            ep.open_raw(raw, sonar_model="EK60", include_bot=True)


class TestEK80Sidecars:
    def test_bot_in_vendor(self, tmp_path):
        raw = tmp_path / "E80-D20210201-T000000.raw"
        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        write_ek80_raw(raw, n_pings=4, n_samples=32, t0=t0)
        depth_truth = write_sidecars(raw, t0, n=4, n_chan=3)

        ed = ep.open_raw(raw, sonar_model="EK80", include_bot=True, include_idx=True)
        vend = ed["Vendor_specific"]
        assert vend["detected_seafloor_depth"].dims == ("channel", "ping_time")
        assert vend["detected_seafloor_depth"].shape == (3, 4)
        # BOT columns are transceiver (config) order; vendor channels are
        # sorted alphabetically -> depths must be remapped per channel
        from synth_ek80 import CH_BB, CH_CW, CH_PW

        config_order = [CH_BB, CH_CW, CH_PW]
        for i, ch in enumerate(vend.coords["channel"].values):
            np.testing.assert_allclose(
                vend["detected_seafloor_depth"].values[i],
                depth_truth[:, config_order.index(str(ch))],
            )
        plat = ed["Platform"]
        np.testing.assert_allclose(plat["file_offset_idx"].values, 4096 * np.arange(4))


class TestSidecarReferenceDifferential:
    """Round-4 (VERDICT item 9): the reference's own sidecar ingestion —
    ParseEK60(bot_file=, idx_file=) -> SetGroupsEK60 with
    _add_index_data_to_platform_ds / _add_seafloor_detection_data_to_vendor_ds
    (set_groups_base.py:371-522) — executes on the same synthetic .raw/.bot/
    .idx bytes our open_raw converts; Platform/Vendor sidecar variables must
    match value-for-value."""

    CONVERT_PARAMS = {
        "survey_name": "", "platform_name": "", "platform_type": "",
        "platform_code_ICES": "", "water_level": np.nan,
        "nmea_gps_sentence": "GGA",
    }

    def test_ek60_idx_bot_differential(self, tmp_path):
        from ref_oracle import load_ref

        raw = tmp_path / "RD0001-D20200101-T000000-EK60.raw"
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        write_ek60_raw(raw, n_pings=6, n_samples=24, t0=t0)
        write_sidecars(raw, t0, n=6, n_chan=2)

        ref_parse = load_ref("convert/parse_ek60")
        parser = ref_parse.ParseEK60(
            str(raw), bot_file=str(raw.with_suffix(".bot")),
            idx_file=str(raw.with_suffix(".idx")),
            storage_options={}, sonar_model="EK60",
        )
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek60")
        sg = ref_sg.SetGroupsEK60(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK60", params=dict(self.CONVERT_PARAMS),
        )
        ref_platform = sg.set_platform()
        ref_vendor = sg.set_vendor()

        ed = ep.open_raw(str(raw), sonar_model="EK60",
                         include_bot=True, include_idx=True)
        our_platform = ed["Platform"]
        our_vendor = ed["Vendor_specific"]

        # IDX -> Platform on time4
        np.testing.assert_array_equal(
            np.asarray(our_platform.coords["time4"].values, dtype="datetime64[ns]"),
            np.asarray(ref_platform.coords["time4"].values, dtype="datetime64[ns]"),
        )
        for var in ("ping_number_idx", "file_offset_idx", "vessel_distance_idx",
                    "latitude_idx", "longitude_idx"):
            assert var in our_platform.data_vars, var
            assert our_platform[var].dims == tuple(ref_platform[var].dims), var
            np.testing.assert_allclose(
                np.asarray(our_platform[var].values, dtype="f8"),
                np.asarray(ref_platform[var].values, dtype="f8"),
                rtol=0, atol=0, err_msg=var,
            )

        # BOT -> Vendor detected_seafloor_depth on (channel, ping_time)
        rv = ref_vendor["detected_seafloor_depth"]
        gv = our_vendor["detected_seafloor_depth"]
        assert tuple(gv.dims) == tuple(rv.dims)
        np.testing.assert_array_equal(
            np.asarray(our_vendor.coords["ping_time"].values, dtype="datetime64[ns]"),
            np.asarray(ref_vendor.coords["ping_time"].values, dtype="datetime64[ns]"),
        )
        np.testing.assert_allclose(
            np.asarray(gv.values, dtype="f8"), np.asarray(rv.values, dtype="f8")
        )

    def test_ek80_bot_differential(self, tmp_path):
        from ref_oracle import load_ref

        raw = tmp_path / "RD80-D20210201-T000000.raw"
        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        write_ek80_raw(raw, n_pings=4, n_samples=32, t0=t0)
        write_sidecars(raw, t0, n=4, n_chan=3)

        ref_parse = load_ref("convert/parse_ek80")
        parser = ref_parse.ParseEK80(
            str(raw), bot_file=str(raw.with_suffix(".bot")),
            idx_file=str(raw.with_suffix(".idx")),
            storage_options={}, sonar_model="EK80",
        )
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        ref_sg = load_ref("convert/set_groups_ek80")
        sg = ref_sg.SetGroupsEK80(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK80", params=dict(self.CONVERT_PARAMS),
        )
        # full set_vendor is not executable on this synthetic (known harness
        # limit, see test_ref_setgroups); drive the BOT helper itself, which
        # is the differential target (set_groups_base.py:469-522)
        import xarray as xr

        base = xr.Dataset(
            coords={"channel": np.asarray(
                [str(c) for c in parser.config_datagram["configuration"].keys()],
                dtype=object,
            )}
        )
        ref_vendor = sg._add_seafloor_detection_data_to_vendor_ds(base)

        ed = ep.open_raw(str(raw), sonar_model="EK80",
                         include_bot=True, include_idx=True)
        gv = ed["Vendor_specific"]["detected_seafloor_depth"]
        rv = ref_vendor["detected_seafloor_depth"]
        assert tuple(gv.dims) == tuple(rv.dims)
        # align channel order (ours sorts; reference keeps config order)
        g_ch = [str(c) for c in ed["Vendor_specific"].coords["channel"].values]
        r_ch = [str(c) for c in ref_vendor.coords["channel"].values]
        remap = [r_ch.index(c) for c in g_ch]
        np.testing.assert_allclose(
            np.asarray(gv.values, dtype="f8"),
            np.asarray(rv.values, dtype="f8")[remap],
        )


class TestNanTimestampHandler:
    def test_all_channels_empty_falls_to_nat(self):
        # config present but zero pings anywhere: ping_time is a non-empty
        # dict of empty lists — must yield the NaT row, not crash on min()
        from echopype_tpu.convert.set_groups_base import SetGroupsBase

        sg = SetGroupsBase.__new__(SetGroupsBase)

        class _Stub:
            ping_time = {"ch1": [], "ch2": []}

        sg.parser_obj = _Stub()
        out = sg._nan_timestamp_handler([np.nan])
        assert out.dtype.kind == "M" and np.isnat(out[0])

    def test_dict_with_pings_takes_earliest_first_ping(self):
        from echopype_tpu.convert.set_groups_base import SetGroupsBase

        sg = SetGroupsBase.__new__(SetGroupsBase)
        t0 = np.datetime64("2020-01-01T00:00:05", "ns")
        t1 = np.datetime64("2020-01-01T00:00:02", "ns")

        class _Stub:
            ping_time = {"ch1": [t0], "ch2": [t1], "ch3": []}

        sg.parser_obj = _Stub()
        out = sg._nan_timestamp_handler([np.nan])
        assert out[0] == t1


class TestOversizedSidecarDatagram:
    def test_idx_size_overruns_eof_superset_recovery(self, tmp_path):
        """A corrupt .idx size field claiming bytes past EOF: the reference
        consumes the rest of the file and drops every later IDX entry
        (ek_raw_io.py:307-314 resyncs from EOF); our scanner resyncs within
        the remaining bytes and recovers the tail — the pinned deliberate
        divergence of test_fault_injection.py::test_corrupt_huge_size_prefix,
        here exercised end-to-end through the sidecar chain.  Ours must be a
        strict SUPERSET of the reference's recovery with identical overlap
        (soak classification: benchmarks/soak_differentials.py
        _sidecar_ref_subset_of_ours)."""
        import struct

        from ref_oracle import load_ref

        raw = tmp_path / "OV-D20200101-T000000.raw"
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        write_ek60_raw(raw, n_pings=9, n_samples=20, t0=t0)
        write_sidecars(raw, t0, n=9, n_chan=2)
        idx = bytearray(raw.with_suffix(".idx").read_bytes())
        # corrupt the size field of the third-from-last IDX datagram so the
        # declared extent overruns EOF (flip the second size byte high)
        from echopype_tpu.convert.simrad.framing import scan_datagrams

        index = scan_datagrams(bytes(idx))
        starts = [int(o) - 4 for o, t in zip(index.body_offset, index.dgram_type)
                  if t == "IDX0"]
        off = starts[-3]
        idx[off + 1] ^= 0xFF
        assert struct.unpack_from("<l", bytes(idx), off)[0] > len(idx) - off
        raw.with_suffix(".idx").write_bytes(bytes(idx))

        ref_parse = load_ref("convert/parse_ek60")
        ref_sg = load_ref("convert/set_groups_ek60")
        parser = ref_parse.ParseEK60(
            str(raw), bot_file=str(raw.with_suffix(".bot")),
            idx_file=str(raw.with_suffix(".idx")), storage_options={},
            sonar_model="EK60")
        parser.parse_raw()
        parser.rectangularize_data(use_swap=False)
        sg = ref_sg.SetGroupsEK60(
            parser, input_file=str(raw), xml_path=None, output_path=None,
            sonar_model="EK60",
            params={"survey_name": "", "platform_name": "", "platform_type": "",
                    "platform_code_ICES": "", "water_level": np.nan,
                    "nmea_gps_sentence": "GGA"})
        ref_platform = sg.set_platform()

        ed = ep.open_raw(str(raw), sonar_model="EK60",
                         include_bot=True, include_idx=True)
        ours = np.asarray(ed["Platform"]["ping_number_idx"].values, dtype="f8")
        ref = np.asarray(ref_platform["ping_number_idx"].values, dtype="f8")
        # the reference loses the corrupted entry AND the tail; we lose only
        # the corrupted entry
        assert len(ref) < len(ours)
        assert set(ref).issubset(set(ours))
        assert 7.0 not in ours  # the corrupted entry itself is unrecoverable
        assert {8.0, 9.0} <= set(ours)  # the tail the reference dropped
        # overlap identical, time-aligned
        rt = np.asarray(ref_platform.coords["time4"].values,
                        dtype="datetime64[ns]")
        ot = np.asarray(ed["Platform"].coords["time4"].values,
                        dtype="datetime64[ns]")
        pos = {t: i for i, t in enumerate(ot)}
        sel = [pos[t] for t in rt]
        np.testing.assert_array_equal(ours[sel], ref)
