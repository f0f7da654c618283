"""Adversarial ingest fault injection: our recovery vs the reference's.

VERDICT r2 item 8.  The reference's RawSimradFile (ek_raw_io.py:473-486)
resyncs on corrupt bytes by scanning for the next plausible header; our
framing scanner (convert/simrad/framing.py) promises identical semantics.
These tests execute BOTH on the same corrupted files and compare the
recovered datagram sequences, then check the downstream repair behaviors
(duplicate-ping dedup, reversed-time refusal + QC repair).
"""

import logging
import struct

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.convert.simrad.framing import scan_datagrams

from ref_oracle import load_ref
from synth_ek60 import write_ek60_raw


def ref_datagram_seq(path):
    """(type[:3], low_date, high_date) per datagram the reference recovers.

    return_raw=True walks _read_next_dgram's full validation+resync path
    without invoking the per-type parsers."""
    io_mod = load_ref("convert/utils/ek_raw_io")
    logging.getLogger("echopype.convert.utils.ek_raw_io").setLevel(logging.ERROR)
    fid = io_mod.RawSimradFile(str(path), "r", return_raw=True)
    out = []
    while True:
        try:
            raw = fid.read(1)
        except io_mod.SimradEOF:
            break
        except Exception:
            break
        if not raw:
            break
        low, high = struct.unpack_from("<LL", raw, 4)
        out.append((raw[:3].decode("latin1"), low, high))
    return out


def our_datagram_seq(path, use_native=True):
    with open(path, "rb") as f:
        buf = f.read()
    idx = scan_datagrams(buf, resync=True, use_native=use_native)
    out = []
    for o in idx.body_offset:
        t = buf[o : o + 3].decode("latin1")
        low, high = struct.unpack_from("<LL", buf, o + 4)
        out.append((t, low, high))
    return out


def _write_base(path, n_pings=12, n_samples=40):
    write_ek60_raw(path, n_pings=n_pings, n_samples=n_samples)
    return path.read_bytes()


@pytest.fixture()
def raw_bytes(tmp_path):
    path = tmp_path / "FI-D20200101-T000000.raw"
    data = _write_base(path)
    return path, bytearray(data)


def _nth_dgram_offset(buf, n):
    """Byte offset of the n-th datagram's leading size word (clean walk)."""
    pos = 0
    for _ in range(n):
        (size,) = struct.unpack_from("<l", buf, pos)
        pos += 4 + size + 4
    return pos


class TestResyncDifferential:
    def _assert_same_recovery(self, path, data):
        path.write_bytes(bytes(data))
        ref = ref_datagram_seq(path)
        ours = our_datagram_seq(path)
        ours_py = our_datagram_seq(path, use_native=False)
        assert ours == ours_py, "C++ and Python scanners disagree"
        assert ref == ours, (
            f"recovery differs: ref {len(ref)} dgrams vs ours {len(ours)}\n"
            f"ref tail: {ref[-5:]}\nours tail: {ours[-5:]}"
        )

    def test_clean_file_identical(self, raw_bytes):
        path, data = raw_bytes
        self._assert_same_recovery(path, data)

    def test_corrupt_small_size_prefix_resync(self, raw_bytes):
        """A too-small length prefix (<16) mid-file: the reference resyncs
        (ek_raw_io.py:278-291) and so do we — identical recovery."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 6)
        struct.pack_into("<l", data, off, 7)
        self._assert_same_recovery(path, data)

    def test_corrupt_huge_size_prefix(self, raw_bytes):
        """A huge length prefix: the reference ABORTS mid-file (the short
        payload read raises DatagramReadError, which parse_base.py:488-493
        does not catch) — it keeps only the prefix.  We resync and keep the
        tail too; the recovered prefix must still match the reference's."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 6)
        struct.pack_into("<l", data, off, 0x7EADBEEF)
        path.write_bytes(bytes(data))
        ref = ref_datagram_seq(path)
        ours = our_datagram_seq(path)
        assert ref == ours[: len(ref)]
        assert len(ours) > len(ref)  # we additionally recover the tail

    def test_corrupt_type_field(self, raw_bytes):
        """Garbage in the 4-char type: the size framing still matches."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 5)
        data[off + 4 : off + 8] = b"\x01\x02\x03\x04"
        path.write_bytes(bytes(data))
        ref = ref_datagram_seq(path)
        ours = our_datagram_seq(path)
        # both must keep reading the datagrams AFTER the corrupted one
        assert ref[-4:] == ours[-4:]

    def test_trailer_mismatch_resync(self, raw_bytes):
        """Trailing size word corrupted: both skip and find the next header."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 7)
        (size,) = struct.unpack_from("<l", bytes(data), off)
        struct.pack_into("<l", data, off + 4 + size, size + 999)
        self._assert_same_recovery(path, data)

    def test_truncated_final_datagram(self, raw_bytes):
        path, data = raw_bytes
        truncated = data[: len(data) - 37]
        path.write_bytes(bytes(truncated))
        ref = ref_datagram_seq(path)
        ours = our_datagram_seq(path)
        assert ref == ours[: len(ref)]
        # ours may at most keep one final trailerless datagram more
        assert len(ours) - len(ref) <= 1

    def test_garbage_gap_resync(self, raw_bytes):
        """A run of random bytes spliced between datagrams."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 8)
        rng = np.random.default_rng(5)
        blob = rng.integers(0, 256, 333, dtype=np.uint8).tobytes()
        data2 = bytes(data[:off]) + blob + bytes(data[off:])
        self._assert_same_recovery(path, bytearray(data2))

    def test_open_raw_survives_corruption(self, raw_bytes):
        """End to end: the corrupted file still converts; only the damaged
        ping is lost."""
        path, data = raw_bytes
        off = _nth_dgram_offset(bytes(data), 6)
        struct.pack_into("<l", data, off, -5)
        path.write_bytes(bytes(data))
        ed = ep.open_raw(path, sonar_model="EK60")
        beam = ed["Sonar/Beam_group1"]
        assert beam.sizes["ping_time"] >= 10  # 12 pings, at most 2 lost


class TestDownstreamRepairs:
    def test_duplicate_ping_time_keep_first(self, tmp_path, caplog):
        """Duplicate ping_time with differing payloads: warn + keep first
        (reference set_groups_ek80.py:1157-1162 / ek_duplicates.py)."""
        from synth_ek80 import (
            config_xml, default_channels, environment_xml, make_fil1,
            make_raw3, make_xml0, parameter_xml, CH_CW,
        )

        channels = [c for c in default_channels() if c["id"] == CH_CW]
        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        cid = channels[0]["id"]
        chunks = [make_xml0(t0, config_xml(channels)), make_xml0(t0, environment_xml())]
        chunks.append(make_fil1(t0, cid, 1, np.full(4, 0.25, dtype="c8"), 6))
        chunks.append(make_fil1(t0, cid, 2, np.full(2, 0.5, dtype="c8"), 1))
        rng = np.random.default_rng(0)
        ts = t0 + np.timedelta64(1, "s")
        first = (rng.normal(0, 1e-3, (32, 4)) + 1j * rng.normal(0, 1e-3, (32, 4))).astype("c8")
        second = first + (1e-3 + 0j)
        for cs in (first, second):  # same timestamp, different payloads
            chunks.append(
                make_xml0(ts, parameter_xml(cid, 0, frequency=120000.0,
                                            sample_interval=32e-6, transmit_power=150.0))
            )
            chunks.append(make_raw3(ts, cid, complex_samples=cs))
        path = tmp_path / "DUP-D20210201-T000000.raw"
        path.write_bytes(b"".join(chunks))
        ed = ep.open_raw(path, sonar_model="EK80")
        beam = ed["Sonar/Beam_group1"]
        assert beam.sizes["ping_time"] == 1  # deduplicated
        got = beam["backscatter_r"].values[0, 0, :32, 0]
        np.testing.assert_allclose(got, first[:, 0].real, rtol=0, atol=1e-7)

    def test_reversed_time_across_files_refused_then_repaired(self, tmp_path):
        """Reversed ping_time across file boundaries: the streamer refuses
        with a repair hint; qc.coerce_increasing_time makes it streamable
        (reference contract: combine.py:458 ascending check + qc/api.py)."""
        from echopype_tpu.parallel import run_survey_mvbs
        from echopype_tpu.xrlite import Dataset

        rng = np.random.default_rng(1)

        def sv_ds(t0, n_ping=10):
            ds = Dataset(
                coords={
                    "channel": np.array(["ch0"], dtype=object),
                    "ping_time": t0
                    + np.arange(n_ping).astype("timedelta64[s]").astype("timedelta64[ns]"),
                    "range_sample": np.arange(16),
                }
            )
            ds["Sv"] = (
                ("channel", "ping_time", "range_sample"),
                rng.normal(-70, 5, (1, n_ping, 16)).astype("f4"),
            )
            ds["echo_range"] = (
                ("channel", "ping_time", "range_sample"),
                np.broadcast_to(np.arange(16, dtype="f4"), (1, n_ping, 16)).copy(),
            )
            return ds

        good = sv_ds(np.datetime64("2022-01-01T00:00:00", "ns"))
        bad = sv_ds(np.datetime64("2022-01-01T00:00:00", "ns"))
        # inject a reversal inside the second file
        pt = np.asarray(bad.coords["ping_time"].values).copy()
        pt[4] = pt[2] - np.timedelta64(3, "s")
        bad.coords["ping_time"].values = pt
        with pytest.raises(ValueError, match="coerce_increasing_time"):
            run_survey_mvbs([good, bad], range_bin_m=8.0, ping_time_bin="5s")
        repaired = ep.qc.coerce_increasing_time(bad)
        assert not ep.qc.exist_reversed_time(repaired, "ping_time")
        out = run_survey_mvbs([good, repaired], range_bin_m=8.0, ping_time_bin="5s")
        assert np.isfinite(out["Sv"].values).any()


class TestIgnoredDatagramTypes:
    """TAG0 (annotations), DEP0 (sounder-detected depths), and a CON1
    (ME70 extra config) datagram interleaved in an EK60 stream: the
    reference's _read_datagrams just logs and ignores TAG/DEP
    (parse_base.py:632-655) and stashes CON1 unused (:385-390); conversion
    must be identical to the clean file, for the reference pipeline and
    for ours."""

    @staticmethod
    def _tag0(ts):
        from synth_ek60 import dt64_to_nt, frame

        low, high = dt64_to_nt(ts)
        return frame(
            struct.pack("<4sLL", b"TAG0", low, high) + b"survey mark alpha\x00"
        )

    @staticmethod
    def _dep0(ts, n=2):
        from synth_ek60 import dt64_to_nt, frame

        low, high = dt64_to_nt(ts)
        body = struct.pack("<4sLLL", b"DEP0", low, high, n)
        for i in range(n):
            body += struct.pack("<3f", 100.0 + i, -30.0, 0.0)
        return frame(body)

    @staticmethod
    def _con1(ts):
        from synth_ek60 import dt64_to_nt, frame

        low, high = dt64_to_nt(ts)
        return frame(struct.pack("<4sLL", b"CON1", low, high) + b"<me70/>\x00")

    def test_conversion_unaffected(self, tmp_path):
        clean = tmp_path / "CL-D20200101-T000000.raw"
        write_ek60_raw(clean, n_pings=8, n_samples=30)
        buf = clean.read_bytes()

        first_end = _nth_dgram_offset(buf, 1)
        mid = _nth_dgram_offset(buf, 6)
        ts = np.datetime64("2020-01-01T00:00:03", "ns")
        # TAG0 + DEP0 splice: reference log-and-ignores these
        tagdep = buf[:mid] + self._tag0(ts) + self._dep0(ts) + buf[mid:]
        dirty = tmp_path / "TD-D20200101-T000000.raw"
        dirty.write_bytes(tagdep)

        # the reference pipeline parses both files identically
        ref_parse = load_ref("convert/parse_ek60")
        outs = []
        for p in (clean, dirty):
            parser = ref_parse.ParseEK60(str(p), storage_options={}, sonar_model="EK60")
            parser.parse_raw()
            parser.rectangularize_data(use_swap=False)
            outs.append(parser.ping_data_dict["power"])
        for ch in outs[0]:
            np.testing.assert_array_equal(outs[0][ch], outs[1][ch])

        # ours: TAG0 + DEP0 + an ME70 CON1 right after CON0 all ignored,
        # conversion identical to the clean file
        spliced = (
            buf[:first_end] + self._con1(ts) + buf[first_end:mid]
            + self._tag0(ts) + self._dep0(ts) + buf[mid:]
        )
        dirty_all = tmp_path / "DI-D20200101-T000000.raw"
        dirty_all.write_bytes(spliced)
        ed_c = ep.open_raw(str(clean), sonar_model="EK60")
        ed_d = ep.open_raw(str(dirty_all), sonar_model="EK60")
        for var in ("backscatter_r", "frequency_nominal"):
            np.testing.assert_array_equal(
                np.asarray(ed_c["Sonar/Beam_group1"][var].values),
                np.asarray(ed_d["Sonar/Beam_group1"][var].values),
            )
        np.testing.assert_array_equal(
            np.asarray(ed_c["Sonar/Beam_group1"].coords["ping_time"].values),
            np.asarray(ed_d["Sonar/Beam_group1"].coords["ping_time"].values),
        )

    def test_reference_con1_parser_crashes(self, tmp_path):
        """The reference cannot actually read an ME70 CON1 datagram on
        Python 3: its version-1 branch calls ``raw_string.strip("\\x00")``
        on bytes (ek_raw_parsers.py:1499 TypeError).  Pinned here so the
        deviation (we skip CON1 cleanly; nothing consumes it in the
        reference either, parse_base.py:385-390) stays documented."""
        clean = tmp_path / "C1-D20200101-T000000.raw"
        write_ek60_raw(clean, n_pings=3, n_samples=20)
        buf = clean.read_bytes()
        first_end = _nth_dgram_offset(buf, 1)
        ts = np.datetime64("2020-01-01T00:00:01", "ns")
        dirty = tmp_path / "C2-D20200101-T000000.raw"
        dirty.write_bytes(buf[:first_end] + self._con1(ts) + buf[first_end:])
        ref_parse = load_ref("convert/parse_ek60")
        parser = ref_parse.ParseEK60(str(dirty), storage_options={}, sonar_model="EK60")
        with pytest.raises(TypeError):
            parser.parse_raw()
        # ours converts it fine (previous test asserts value parity)
        ep.open_raw(str(dirty), sonar_model="EK60")


class TestInflatedSampleCount:
    """A RAW0 body-count field larger than the datagram body (framing still
    valid): the decode layer must clamp to the body extent — the fused C++
    gathers would otherwise read past the buffer, and max_count would
    balloon the padded allocation."""

    def _first_raw0(self, data):
        pos = 0
        while pos + 8 <= len(data):
            (size,) = struct.unpack_from("<l", data, pos)
            body = pos + 4
            if data[body : body + 4] == b"RAW0":
                return body, size
            pos = body + size + 4
        raise AssertionError("no RAW0 found")

    def test_count_clamped_to_body(self, raw_bytes):
        path, data = raw_bytes
        clean = ep.open_raw(path, sonar_model="EK60")
        ref_bs = np.asarray(
            clean["Sonar/Beam_group1"]["backscatter_r"].values, dtype="f8"
        )
        body, _size = self._first_raw0(data)
        # count field at body+80 (RAW0 layout: 16B type+date, 4B chan+mode,
        # 13 f4 fields, 2B transmit_mode, 6B spare, 4B offset)
        struct.pack_into("<l", data, body + 80, 10_000_000)
        path.write_bytes(bytes(data))
        # our loggers don't propagate (reference parity) — attach a handler
        records = []
        h = logging.Handler()
        h.emit = lambda r: records.append(r.getMessage())
        lg = logging.getLogger("echopype_tpu.convert.simrad.decode")
        lg.addHandler(h)
        try:
            ed = ep.open_raw(path, sonar_model="EK60")
        finally:
            lg.removeHandler(h)
        bs = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values, dtype="f8")
        # the body holds exactly the original samples, so the clamped decode
        # reproduces the untampered conversion (no OOB reads, no 10M-wide pad)
        assert bs.shape == ref_bs.shape
        np.testing.assert_array_equal(np.isnan(bs), np.isnan(ref_bs))
        m = ~np.isnan(ref_bs)
        np.testing.assert_allclose(bs[m], ref_bs[m], rtol=0, atol=0)
        assert any("claim more samples" in m for m in records)


# ----------------------------------------------------------- AZFP (.01A)
from contextlib import contextmanager


@contextmanager
def _capture_log(logger_name):
    """Our loggers don't propagate (reference parity) — attach a handler."""
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    lg = logging.getLogger(logger_name)
    lg.addHandler(h)
    try:
        yield records
    finally:
        lg.removeHandler(h)


class TestAZFPFaultInjection:
    """Round-5 ingest hardening (VERDICT r4 item 5): tampered count/layout
    fields in .01A profile headers must not mis-slice or raise — the first
    profile establishes the deployment layout and later deviations are
    repaired from it (parse_azfp.py ingest hardening)."""

    # header byte offsets (big-endian): 4 u2 + 1 u4 + 7 u2 = 30 ... see
    # parse_azfp.HEADER_FIELDS: num_bins slots start at byte 42
    NUM_BINS_OFF = 42
    RECORD_BYTES = 124 + 2 * 40 * 2  # header + 2ch x 40 u2 counts

    def _convert(self, raw, xml):
        return ep.open_raw(str(raw), sonar_model="AZFP", xml_path=str(xml))

    def _fixture(self, tmp_path):
        from synth_azfp import write_azfp_raw, write_azfp_xml

        raw = tmp_path / "21031500.01A"
        xml = tmp_path / "inst.xml"
        write_azfp_xml(xml)
        write_azfp_raw(raw, n_pings=5)
        return raw, xml

    def test_inflated_num_bins_repaired(self, tmp_path):
        raw, xml = self._fixture(tmp_path)
        clean = self._convert(raw, xml)
        want = np.asarray(clean["Sonar/Beam_group1"]["backscatter_r"].values)

        data = bytearray(raw.read_bytes())
        struct.pack_into(">H", data, 2 * self.RECORD_BYTES + self.NUM_BINS_OFF, 30000)
        raw.write_bytes(bytes(data))
        with _capture_log("echopype_tpu.convert.parse_azfp") as records:
            ed = self._convert(raw, xml)
        got = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values)
        # the repaired conversion reproduces the untampered one exactly
        np.testing.assert_array_equal(got, want)
        assert any("repairing" in m for m in records)

    def test_truncated_payload_drops_tail(self, tmp_path):
        raw, xml = self._fixture(tmp_path)
        clean = self._convert(raw, xml)
        want = np.asarray(clean["Sonar/Beam_group1"]["backscatter_r"].values)

        data = raw.read_bytes()
        # cut mid-way through the LAST profile's counts payload
        raw.write_bytes(data[: 4 * self.RECORD_BYTES + 124 + 37])
        with _capture_log("echopype_tpu.convert.parse_azfp") as records:
            ed = self._convert(raw, xml)
        got = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values)
        np.testing.assert_array_equal(got, want[:, :4, :])
        assert any("truncated tail" in m for m in records)


# ----------------------------------------------------------- AZFP6 (.azfp)
class TestAZFP6FaultInjection:
    """ULS6 records are framed (start/end flags + byte counts), so a corrupt
    record is validated against its own framing: header-field tampering is
    repaired from the established layout; an unreadable record rolls back
    and the stream resyncs at the next start flag (one ping lost, never the
    file tail)."""

    def _fixture(self, tmp_path, n_pings=5):
        from test_azfp6 import write_azfp6_raw

        raw = tmp_path / "22070100.azfp"
        write_azfp6_raw(raw, n_pings=n_pings)
        return raw

    @staticmethod
    def _record_offsets(data):
        flag = struct.pack("<I", 0xFF01AA00)
        out, pos = [], 0
        while True:
            i = data.find(flag, pos)
            if i < 0:
                return out
            out.append(i)
            pos = i + 1

    def test_tampered_num_bins_repaired(self, tmp_path):
        from test_azfp6 import NUM_BINS

        raw = self._fixture(tmp_path)
        clean = ep.open_raw(str(raw), sonar_model="AZFP6")
        want = np.asarray(clean["Sonar/Beam_group1"]["backscatter_r"].values)

        data = bytearray(raw.read_bytes())
        recs = self._record_offsets(bytes(data))
        # num_bins header record inside record 2: rc=0x21 then two u16 values
        pat = struct.pack("<HHH", 0x21, NUM_BINS, NUM_BINS)
        i = bytes(data).find(pat, recs[2], recs[3])
        assert i > 0
        struct.pack_into("<H", data, i + 2, 60000)
        raw.write_bytes(bytes(data))
        with _capture_log("echopype_tpu.convert.parse_azfp6") as records:
            ed = ep.open_raw(str(raw), sonar_model="AZFP6")
        got = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values)
        np.testing.assert_array_equal(got, want)
        assert any("repairing" in m for m in records)

    def test_garbage_record_resyncs(self, tmp_path):
        raw = self._fixture(tmp_path)
        clean = ep.open_raw(str(raw), sonar_model="AZFP6")
        want = np.asarray(clean["Sonar/Beam_group1"]["backscatter_r"].values)
        want_t = np.asarray(clean["Sonar/Beam_group1"].coords["ping_time"].values)

        data = bytearray(raw.read_bytes())
        recs = self._record_offsets(bytes(data))
        # blast record 1's typed header with garbage (start flag intact)
        data[recs[1] + 12 : recs[1] + 44] = b"\xee" * 32
        raw.write_bytes(bytes(data))
        with _capture_log("echopype_tpu.convert.parse_azfp6") as records:
            ed = ep.open_raw(str(raw), sonar_model="AZFP6")
        got = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values)
        got_t = np.asarray(ed["Sonar/Beam_group1"].coords["ping_time"].values)
        keep = [0, 2, 3, 4]
        np.testing.assert_array_equal(got, want[:, keep, :])
        np.testing.assert_array_equal(got_t, want_t[keep])
        assert any("dropped" in m for m in records)

    def test_truncated_tail(self, tmp_path):
        raw = self._fixture(tmp_path)
        clean = ep.open_raw(str(raw), sonar_model="AZFP6")
        want = np.asarray(clean["Sonar/Beam_group1"]["backscatter_r"].values)

        data = raw.read_bytes()
        recs = self._record_offsets(data)
        raw.write_bytes(data[: recs[4] + 60])  # cut inside the last record
        with _capture_log("echopype_tpu.convert.parse_azfp6") as records:
            ed = ep.open_raw(str(raw), sonar_model="AZFP6")
        got = np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values)
        np.testing.assert_array_equal(got, want[:, :4, :])


# ----------------------------------------------------------- AD2CP (.ad2cp)
class TestAD2CPFaultInjection:
    """Nortek records carry header + record checksums: random corruption is
    skipped with a log; a record whose COUNT field is tampered and whose
    checksum is recomputed (worst case) must still degrade to a logged skip,
    never an unhandled crash or a mis-slice of later records."""

    def _fixture(self, tmp_path):
        from test_ad2cp import write_ad2cp

        raw = tmp_path / "mooring.ad2cp"
        write_ad2cp(raw, n_pings=4)
        return raw

    def test_checksum_skip_preserves_rest(self, tmp_path):
        raw = self._fixture(tmp_path)
        clean = ep.open_raw(str(raw), sonar_model="AD2CP")
        want = np.asarray(clean["Sonar/Beam_group2"]["amplitude"].values)
        want_t = np.asarray(clean["Sonar/Beam_group2"].coords["ping_time"].values)

        data = bytearray(raw.read_bytes())
        # corrupt one byte inside ping 1's echosounder record body: find the
        # second 0x1C packet header and flip a payload byte past the header
        offs = [i for i in range(len(data) - 4)
                if data[i] == 0xA5 and data[i + 2] == 0x1C]
        assert len(offs) == 4
        data[offs[1] + 60] ^= 0xFF
        raw.write_bytes(bytes(data))
        with _capture_log("echopype_tpu.convert.parse_ad2cp") as records:
            ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        got = np.asarray(ed["Sonar/Beam_group2"]["amplitude"].values)
        got_t = np.asarray(ed["Sonar/Beam_group2"].coords["ping_time"].values)
        keep = [0, 2, 3]
        np.testing.assert_array_equal(got_t, want_t[keep])
        np.testing.assert_array_equal(got[..., 0], want[keep][..., 0])
        assert any("checksum mismatch" in m for m in records)

    def test_inflated_count_with_valid_checksum_skips(self, tmp_path):
        from echopype_tpu.convert.parse_ad2cp import checksum

        raw = self._fixture(tmp_path)
        clean = ep.open_raw(str(raw), sonar_model="AD2CP")
        want = np.asarray(clean["Sonar/Beam_group2"]["amplitude"].values)

        data = bytearray(raw.read_bytes())
        offs = [i for i in range(len(data) - 4)
                if data[i] == 0xA5 and data[i + 2] == 0x1C]
        pos = offs[1]
        (rec_size,) = struct.unpack_from("<H", data, pos + 4)
        body = pos + 10
        # num_beams_and_coordinate_system_and_num_cells (echosounder: cell
        # count) at body offset 30; inflate it, then recompute BOTH checksums
        struct.pack_into("<H", data, body + 30, 0xFFFF)
        struct.pack_into("<H", data, pos + 6, checksum(bytes(data[body : body + rec_size])))
        struct.pack_into("<H", data, pos + 8, checksum(bytes(data[pos : pos + 8])))
        raw.write_bytes(bytes(data))
        with _capture_log("echopype_tpu.convert.parse_ad2cp") as records:
            ed = ep.open_raw(str(raw), sonar_model="AD2CP")
        got = np.asarray(ed["Sonar/Beam_group2"]["amplitude"].values)
        # the poisoned record is skipped with a log; the other pings survive
        assert got.shape[0] == want.shape[0] - 1
        assert any("Failed to parse AD2CP record" in m for m in records)
