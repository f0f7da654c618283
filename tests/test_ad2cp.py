"""AD2CP conversion tests with a synthetic packet writer."""

import struct

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.convert.parse_ad2cp import checksum


def _v3_record(
    pkt_id,
    year=2022,
    month=5,
    day=10,
    hour=8,
    minute=0,
    second=0,
    num_beams=4,
    num_cells=20,
    echosounder=False,
    n_echo_cells=25,
    seed=0,
    include_vel=True,
    include_amp=True,
    include_corr=True,
    with_altimeter=False,
    with_ast=False,
    with_altimeter_raw=False,
    n_alt_samples=6,
    with_ahrs=False,
    with_percentage_good=False,
    with_std_dev=False,
    dataset_description=None,
    status=0,
    status0=0,
):
    rng = np.random.default_rng(seed)
    out = bytearray()
    out += struct.pack("<BB", 3, 76)  # version, offset_of_data
    cfg = 0b1111  # sensors valid
    if not echosounder:
        cfg |= (include_vel << 5) | (include_amp << 6) | (include_corr << 7)
    cfg |= (
        (with_altimeter << 8)
        | (with_altimeter_raw << 9)
        | (with_ast << 10)
        | (echosounder << 11)
        | (with_ahrs << 12)
        | (with_percentage_good << 13)
        | (with_std_dev << 14)
    )
    out += struct.pack("<H", cfg)
    out += struct.pack("<I", 900123)  # serial
    out += struct.pack(
        "<BBBBBB", year - 1900, month - 1, day, hour, minute, second
    )
    out += struct.pack("<H", 0)  # microsec100
    out += struct.pack("<H", 14800)  # speed_of_sound (0.1 m/s)
    out += struct.pack("<h", 1012)  # temperature (0.01 C)
    out += struct.pack("<I", 10125)  # pressure (0.001 dbar)
    out += struct.pack("<H", 18050)  # heading
    out += struct.pack("<h", 123)  # pitch
    out += struct.pack("<h", -48)  # roll
    if echosounder:
        bcc = n_echo_cells
    else:
        bcc = (num_cells & 0x3FF) | (1 << 10) | ((num_beams & 0xF) << 12)
    out += struct.pack("<H", bcc)
    out += struct.pack("<H", 750)  # cell size mm
    out += struct.pack("<H", 2000)  # blanking mm
    out += struct.pack("<B", 60)  # nominal correlation
    out += struct.pack("<B", 4)  # temp from pressure sensor
    out += struct.pack("<H", 152)  # battery 0.1V
    out += struct.pack("<hhh", 10, -20, 30)  # magnetometer
    out += struct.pack("<hhh", 100, 200, 16384)  # accelerometer xyz
    out += struct.pack("<H", 500)  # ambiguity vel / echosounder freq
    # dataset_description: 4-bit beam fields -> physical beams 1..num_beams
    # (was octal 0o4321, which decodes to only 3 active beams and makes the
    # record self-inconsistent)
    if dataset_description is None:
        dataset_description = 0
        for slot in range(num_beams):
            dataset_description |= (slot + 1) << (4 * slot)
    out += struct.pack("<H", dataset_description)
    out += struct.pack("<H", 80)  # transmit energy
    out += struct.pack("<b", -3)  # velocity scaling
    out += struct.pack("<b", -10)  # power level
    out += struct.pack("<h", 20)  # magnetometer temp
    out += struct.pack("<h", 2500)  # rtc temp
    out += struct.pack("<H", 0)  # error
    out += struct.pack("<H", status0)  # status0
    out += struct.pack("<I", status)  # status
    out += struct.pack("<I", 1)  # ensemble counter
    truth = {}
    if not echosounder:
        vel = rng.integers(-30000, 30000, num_beams * num_cells).astype("<i2")
        amp = rng.integers(0, 200, num_beams * num_cells).astype("<u1")
        corr = rng.integers(0, 100, num_beams * num_cells).astype("<u1")
        if include_vel:
            out += vel.tobytes()
            truth["vel"] = vel.reshape(num_beams, num_cells).astype("f8") * 1e-3
        if include_amp:
            out += amp.tobytes()
            truth["amp"] = amp.reshape(num_beams, num_cells).astype("f8") / 2
        if include_corr:
            out += corr.tobytes()
            truth["corr"] = corr.reshape(num_beams, num_cells).astype("f8")
    # optional field blocks, in record order (ref parse_ad2cp.py:1447-1599)
    if with_altimeter:
        out += struct.pack("<f", 12.5 + second)
        out += struct.pack("<H", 77)
    if with_ast:
        out += struct.pack("<f", 10.25 + second)  # ast_distance
        out += struct.pack("<H", 321)  # ast_quality (/100)
        out += struct.pack("<h", -40)  # ast_offset_100us
        out += struct.pack("<f", 101.5)  # ast_pressure
        out += bytes(range(8))  # altimeter spare
    if with_altimeter_raw:
        out += struct.pack("<H", n_alt_samples)
        out += struct.pack("<H", 12345)  # sample distance (/10000)
        alt = rng.integers(-32000, 32000, n_alt_samples).astype("<i2")
        out += alt.tobytes()
        truth["alt_raw"] = alt.astype("f8") / 32768
    if echosounder:
        echo = rng.integers(0, 50000, n_echo_cells).astype("<u2")
        out += echo.tobytes()
        # instruments emit signed samples despite the spec (ref parse_ad2cp.py:1520)
        truth["echo"] = echo.astype("<i2").astype("f8") / 100
    if with_ahrs:
        ahrs = rng.normal(size=16).astype("<f4")
        out += ahrs.tobytes()
        truth["ahrs"] = ahrs.astype("f8")
    if with_percentage_good:
        pg = rng.integers(0, 101, num_cells).astype("<u1")
        out += pg.tobytes()
        truth["pg"] = pg.astype("f8")
    if with_std_dev:
        out += struct.pack("<hhhh", 12, -34, 567, 89)
        out += bytes(24)
    return bytes(out), truth


def _packet(pkt_id, record):
    header = struct.pack("<BBBBH", 0xA5, 10, pkt_id, 0x10, len(record))
    header += struct.pack("<H", checksum(record))
    header += struct.pack("<H", checksum(header))
    return header + record


def _string_packet(text):
    record = bytes([0x10]) + text.encode()
    return _packet(0xA0, record)


def _bt_record(second=0, seed=0, n_beams=4):
    """BOTTOM_TRACK record (DF20b layout, ref parse_ad2cp.py:1600+)."""
    rng = np.random.default_rng(seed)
    out = struct.pack("<BB", 1, 68)  # version, offset_of_data
    cfg = (1 << 0) | (1 << 1) | (1 << 5) | (1 << 8) | (1 << 9)  # vel+dist+fom
    out += struct.pack("<H", cfg)
    out += struct.pack("<I", 12345)
    out += struct.pack("<BBBBBB", 122, 4, 10, 8, 0, second)
    out += struct.pack("<H", 0)  # microsec100
    out += struct.pack("<H", 14800)  # speed_of_sound
    out += struct.pack("<h", 1012)  # temperature
    out += struct.pack("<I", 101325)  # pressure
    out += struct.pack("<H", 9000)  # heading
    out += struct.pack("<hh", -123, 45)  # pitch, roll
    out += struct.pack("<H", (n_beams << 12) | (1 << 10))  # beams/coord/cells
    out += struct.pack("<HH", 2000, 100)  # cell_size, blanking
    out += struct.pack("<BB", 50, 0)  # nominal_correlation, spare
    out += struct.pack("<H", 152)  # battery_voltage
    out += struct.pack("<hhh", 100, -200, 300)  # magnetometer
    out += struct.pack("<hhh", 1000, 2000, 16384)  # accelerometer
    out += struct.pack("<I", 10000)  # ambiguity_velocity (u4 in BT)
    out += struct.pack("<H", (1 << 12) | (2 << 8) | (3 << 4) | 4)  # beams MSB-first
    out += struct.pack("<H", 80)  # transmit_energy
    out += struct.pack("<bb", -3, -10)  # velocity_scaling, power_level
    out += struct.pack("<hh", 21, 2150)  # magnetometer/rtc temperature
    out += struct.pack("<III", 0, 0, second)  # error, status, ensemble
    out += rng.integers(-(2**20), 2**20, n_beams).astype("<i4").tobytes()
    out += rng.integers(0, 2**20, n_beams).astype("<i4").tobytes()
    out += rng.integers(0, 2**16, n_beams).astype("<u2").tobytes()
    return out


def write_ad2cp(path, n_pings=4, with_bottom_track=False, with_echosounder_raw=False,
                minute=0, with_average=True, with_echosounder=True,
                echosounder_first=False, average_id=0x16, record_kw=None):
    """Synthesize an .ad2cp file.  ``record_kw`` passes optional-field knobs
    to the average/burst ``_v3_record``; ``average_id=0x15`` emits burst
    records instead; ``echosounder_first`` flips the per-ping packet order
    (exercises the reference's first-packet-at-timestamp combine rows)."""
    chunks = [
        _string_packet(
            "GETCLOCKSTR,TIME=\"2022-05-10 08:00:00\"\n"
            "GETECHO,PULSECOMP1=1,PULSECOMP2=0,PULSECOMP3=0\n"
            "GETHW,FW=2.1.3\n"
        )
    ]
    record_kw = record_kw or {}
    truths = {"average": [], "echosounder": []}
    for p in range(n_pings):
        ping_chunks = []
        if with_average:
            rec, truth = _v3_record(average_id, minute=minute, second=p, seed=p, **record_kw)
            ping_chunks.append(_packet(average_id, rec))
            truths["average"].append(truth)
        if with_echosounder_raw:
            rng = np.random.default_rng(300 + p)
            ping_chunks.append(
                _raw_packet(0x23, _raw_record(p, rng.integers(-(2**30), 2**30, (16, 2))))
            )
        if with_echosounder:
            # keep the echosounder record's dataset_description beam count
            # consistent with the burst/average records: the per-file beam
            # coord is the longest `beams` list across packets (reference
            # semantics), so a 4-beam description next to 3-beam data makes
            # the file self-inconsistent and BOTH implementations reject it
            rec, truth = _v3_record(0x1C, minute=minute, second=p,
                                    echosounder=True, seed=100 + p,
                                    num_beams=record_kw.get("num_beams", 4))
            es = _packet(0x1C, rec)
            if echosounder_first:
                ping_chunks.insert(0, es)
            else:
                ping_chunks.append(es)
            truths["echosounder"].append(truth)
        if with_bottom_track:
            ping_chunks.append(_packet(0x17, _bt_record(second=p, seed=200 + p)))
        chunks.extend(ping_chunks)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return truths


@pytest.fixture(scope="module")
def ad2cp_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ad2cp")
    raw = tmp / "mooring.ad2cp"
    truth = write_ad2cp(raw)
    ed = ep.open_raw(raw, sonar_model="AD2CP")
    return ed, truth


class TestAd2cp:
    def test_beam_groups(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        sonar = ed["Sonar"]
        names = list(sonar.coords["beam_group"].values)
        assert names == ["Beam_group1", "Beam_group2"]
        assert "Average" in str(sonar["beam_group_descr"].values[0])
        assert "Echosounder" in str(sonar["beam_group_descr"].values[1])

    def test_average_data(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        bg = ed["Sonar/Beam_group1"]
        vel = bg["velocity"].values
        assert vel.shape == (4, 4, 20)
        np.testing.assert_allclose(vel[0], truth["average"][0]["vel"], atol=1e-9)
        np.testing.assert_allclose(
            bg["amplitude"].values[1], truth["average"][1]["amp"]
        )
        np.testing.assert_allclose(
            bg["correlation"].values[2], truth["average"][2]["corr"]
        )
        np.testing.assert_allclose(bg["cell_size"].values, 0.75)
        np.testing.assert_allclose(bg["blanking"].values, 2.0)

    def test_echosounder_data(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        bg = ed["Sonar/Beam_group2"]
        amp = bg["amplitude"].values
        assert amp.shape == (4, 25)
        np.testing.assert_allclose(amp[0], truth["echosounder"][0]["echo"])
        # reference cross-packet combine: scalar rows come from the FIRST
        # packet at each timestamp — here the average packet, which carries
        # no echosounder_frequency, so the row is zero-filled
        # (ref set_groups_ad2cp.py:132-139,420-422)
        np.testing.assert_allclose(bg["echosounder_frequency"].values, 0.0)
        # pulse compression flag from config string
        np.testing.assert_allclose(bg["pulse_compressed"].values, [1, 0, 0])

    def test_env_platform(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        env = ed["Environment"]
        np.testing.assert_allclose(env["sound_speed_indicative"].values, 1480.0)
        np.testing.assert_allclose(env["temperature"].values, 10.12)
        plat = ed["Platform"]
        np.testing.assert_allclose(plat["heading"].values, 180.5)
        np.testing.assert_allclose(plat["pitch"].values, 1.23)
        np.testing.assert_allclose(plat["roll"].values, -0.48)

    def test_vendor_config(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        vend = ed["Vendor_specific"]
        np.testing.assert_allclose(vend["battery_voltage"].values, 15.2)
        assert vend.attrs["GETHW_FW"] == "2.1.3"

    def test_timestamps(self, ad2cp_ed):
        ed, truth = ad2cp_ed
        pt = ed["Sonar/Beam_group1"].coords["ping_time"].values
        assert pt[0] == np.datetime64("2022-05-10T08:00:00", "ns")
        assert (np.diff(pt) == np.timedelta64(1, "s")).all()


def _v2_record(second=0, seed=5, nb=4, nc=12):
    """Version-2 burst/average record (reference layout parse_ad2cp.py:898+)."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    out += struct.pack("<BB", 2, 68)
    out += struct.pack("<I", 800500)  # serial (v2: serial before config)
    out += struct.pack("<H", 0b11101111)  # config
    out += struct.pack("<BBBBBB", 2021 - 1900, 4, 2, 6, 30, second)
    out += struct.pack("<H", 0)
    out += struct.pack("<H", 15000)  # sound speed
    out += struct.pack("<h", 850)  # temperature
    out += struct.pack("<I", 20500)  # pressure
    out += struct.pack("<H", 9000)  # heading
    out += struct.pack("<h", -250)  # pitch
    out += struct.pack("<h", 100)  # roll
    out += struct.pack("<HH", 0, 0)  # error, status
    bcc = (nc & 0x3FF) | (1 << 10) | ((nb & 0xF) << 12)
    out += struct.pack("<H", bcc)
    out += struct.pack("<HH", 500, 1000)  # cell size, blanking
    out += struct.pack("<H", 5000)  # velocity range
    out += struct.pack("<H", 148)  # battery
    out += struct.pack("<hhh", 1, 2, 3)
    out += struct.pack("<hhh", 0, 0, 16384)
    out += struct.pack("<H", 1000)  # ambiguity velocity
    out += struct.pack("<H", 0o4321)  # dataset description
    out += struct.pack("<H", 60)  # transmit energy
    out += struct.pack("<bb", -3, -6)  # vel scaling, power
    out += struct.pack("<I", 0)  # spare
    vel = rng.integers(-20000, 20000, nb * nc).astype("<i2")
    amp = rng.integers(0, 200, nb * nc).astype("<u1")
    corr = rng.integers(0, 100, nb * nc).astype("<u1")
    out += vel.tobytes() + amp.tobytes() + corr.tobytes()
    return bytes(out), {"vel": vel.reshape(nb, nc).astype("f8") * 1e-3}


class TestAd2cpV2:
    def test_v2_average_record(self, tmp_path):
        """Version-2 burst/average records parse through the v2 layout."""
        nb, nc = 4, 12
        record, truth = _v2_record(second=0, seed=5, nb=nb, nc=nc)
        vel = (truth["vel"] * 1e3).astype("<i2").reshape(-1)
        raw = tmp_path / "v2.ad2cp"
        raw.write_bytes(_packet(0x16, record))
        ed = ep.open_raw(raw, sonar_model="AD2CP")
        bg = ed["Sonar/Beam_group1"]
        v = bg["velocity"].values
        assert v.shape == (1, nb, nc)
        np.testing.assert_allclose(v[0], vel.reshape(nb, nc) * 1e-3, atol=1e-9)
        np.testing.assert_allclose(
            ed["Environment"]["temperature"].values, 8.5
        )
        np.testing.assert_allclose(bg["velocity_range"].values, 5.0)


def _raw_packet(pkt_id, record):
    """0x23/0x24 packets carry a u4 record size (12-byte header)."""
    header = struct.pack("<BBBBI", 0xA5, 12, pkt_id, 0x10, len(record))
    header += struct.pack("<H", checksum(record))
    header += struct.pack("<H", checksum(header))
    return header + record


def _raw_record(second, iq_int32):
    """ECHOSOUNDER_RAW record: own header (time at offset 2), 208 reserved
    bytes, then i32 signed-fraction IQ pairs (ref parse_ad2cp.py:1739+)."""
    n = iq_int32.shape[0]
    out = struct.pack("<BB", 1, 240)  # version, offset_of_data
    out += struct.pack("<BBBBBB", 122, 4, 10, 8, 0, second)
    out += struct.pack("<H", 0)  # microsec100
    out += struct.pack("<H", 0)  # error
    out += struct.pack("<I", 0)  # status
    out += struct.pack("<I", 12345)  # serial_number
    out += struct.pack("<I", n)  # num_complex_samples
    out += struct.pack("<I", 0)  # ind_start_samples
    out += struct.pack("<f", 500000.0)  # freq_raw_sample_data
    out += bytes(208)
    out += iq_int32.astype("<i4").tobytes()
    return out


class TestAd2cpEchosounderRawTransmit:
    def test_transmit_pulse_variables(self, tmp_path):
        rng = np.random.default_rng(9)
        chunks = []
        truth_rx, truth_tx = [], []
        for p in range(3):
            rx_i = rng.integers(-(2**30), 2**30, (30, 2))
            chunks.append(_raw_packet(0x23, _raw_record(p, rx_i)))
            truth_rx.append(rx_i.astype("f8") / 2**31)
            if p < 2:  # fewer transmit records than receive
                tx_i = rng.integers(-(2**30), 2**30, (8, 2))
                chunks.append(_raw_packet(0x24, _raw_record(p, tx_i)))
                truth_tx.append(tx_i.astype("f8") / 2**31)
        raw = tmp_path / "esraw.ad2cp"
        raw.write_bytes(b"".join(chunks))
        ed = ep.open_raw(raw, sonar_model="AD2CP")
        bg = ed["Sonar/Beam_group1"]
        assert bg["backscatter_r"].dims == ("ping_time", "range_sample")
        np.testing.assert_allclose(bg["backscatter_r"].values[0], truth_rx[0][:, 0], rtol=1e-7)
        np.testing.assert_allclose(bg["backscatter_i"].values[2], truth_rx[2][:, 1], rtol=1e-7)
        # transmit pulse rides its own (shorter) time axis
        assert bg["transmit_pulse_r"].dims == (
            "ping_time_transmit",
            "transmit_sample",
        )
        assert bg["transmit_pulse_r"].shape == (2, 8)
        np.testing.assert_allclose(bg["transmit_pulse_r"].values[1], truth_tx[1][:, 0], rtol=1e-7)
        np.testing.assert_allclose(bg["transmit_pulse_i"].values[0], truth_tx[0][:, 1], rtol=1e-7)
