"""Synthetic EK80 .raw file writer for tests.

Produces byte-exact XML0 (configuration/environment/parameter), FIL1, RAW3
datagrams, with a broadband (LFM) complex channel, a CW complex channel, and
a CW power channel.
"""

import struct

import numpy as np

from synth_ek60 import dt64_to_nt, frame, make_nme0

CH_BB = "WBT 400140-15 ES70-7C"
CH_CW = "WBT 400141-15 ES120-7C"
CH_PW = "GPT 400142-15 ES38B"


def make_xml0(timestamp, xml_string: str) -> bytes:
    low, high = dt64_to_nt(timestamp)
    body = struct.pack("<4sLL", b"XML0", low, high) + xml_string.encode() + b"\x00"
    return frame(body)


def config_xml(channels, mounts=False):
    """Configuration XML0 body.  mounts=True adds a ship-install
    <Transducers> section (mounting offsets live there in real WBT files),
    including a duplicate-name decoy so the name-ambiguity rule is exercised
    (reference ek_raw_parsers.py:1010-1056)."""
    tcvrs = []
    for i, ch in enumerate(channels):
        cal_block = ""
        if ch.get("cal_freqs") is not None:
            pars = "".join(
                f'<FrequencyPar Frequency="{int(f)}" Gain="{g}" Impedance="75" Phase="0" '
                f'BeamWidthAlongship="7.0" BeamWidthAthwartship="7.0" '
                f'AngleOffsetAlongship="0.1" AngleOffsetAthwartship="0.1"/>'
                for f, g in zip(ch["cal_freqs"], ch["cal_gains"])
            )
            cal_block = pars
        tcvrs.append(
            f"""<Transceiver TransceiverNumber="{i + 1}" TransceiverType="{ch['tcvr_type']}"
              Version="1.2" IPAddress="10.0.0.{i+1}" Impedance="{ch.get('impedance', 5400)}"
              RxSampleFrequency="{ch.get('fs', 1500000)}">
            <Channels>
            <Channel ChannelID="{ch['id']}" MaxTxPowerTransceiver="2000"
               PulseDuration="{';'.join(str(x) for x in ch['pulse_durations'])}"
               SampleInterval="{';'.join(str(x) for x in ch['sample_intervals'])}"
               HWChannelConfiguration="1">
              <Transducer TransducerName="{ch['id'].split()[-1]}" SerialNumber="123"
                 Frequency="{ch['frequency']}" FrequencyMinimum="{ch.get('fmin', ch['frequency'])}"
                 FrequencyMaximum="{ch.get('fmax', ch['frequency'])}"
                 BeamType="{ch.get('beam_type', 1)}"
                 Gain="{';'.join(str(g) for g in ch['gains'])}"
                 SaCorrection="{';'.join(str(s) for s in ch['sas'])}"
                 EquivalentBeamAngle="{ch.get('eba', -20.7)}"
                 BeamWidthAlongship="{ch.get('bw_along', 7.0)}"
                 BeamWidthAthwartship="{ch.get('bw_athwart', 7.0)}"
                 AngleSensitivityAlongship="{ch.get('angle_sens_along', 23.0)}"
                 AngleSensitivityAthwartship="{ch.get('angle_sens_athwart', 23.0)}"
                 AngleOffsetAlongship="{ch.get('angle_offset_along', 0.0)}"
                 AngleOffsetAthwartship="{ch.get('angle_offset_athwart', 0.0)}"
                 TransducerOffsetX="{ch.get('offset_x', 0.0)}"
                 TransducerOffsetY="{ch.get('offset_y', 0.0)}"
                 TransducerOffsetZ="{ch.get('offset_z', 0.0)}">
                 {cal_block}
              </Transducer>
            </Channel>
            </Channels>
            </Transceiver>"""
        )
    mounts_block = ""
    if mounts:
        mounts_block = (
            "<Transducers>"
            # unique name -> matches the ES70-7C channel by TransducerName
            '<Transducer TransducerName="ES70-7C" TransducerSerialNumber="" '
            'TransducerCustomName="Main" TransducerOffsetX="1.1" '
            'TransducerOffsetY="0.2" TransducerOffsetZ="3.3" '
            'TransducerAlphaX="0.5" TransducerAlphaY="0.0" TransducerAlphaZ="0.0"/>'
            # duplicate-name decoy: name alone must NOT match
            '<Transducer TransducerName="ES120-7C" TransducerSerialNumber="" '
            'TransducerCustomName="spare" TransducerOffsetX="9.9" '
            'TransducerOffsetY="9.9" TransducerOffsetZ="9.9"/>'
            # duplicate name resolved by the transceiver-channel token
            '<Transducer TransducerName="ES120-7C" TransducerSerialNumber="" '
            'TransducerCustomName="WBT 400141-15" TransducerOffsetX="2.1" '
            'TransducerOffsetY="0.0" TransducerOffsetZ="4.2"/>'
            # different name, matches the ES38B channel by serial number
            '<Transducer TransducerName="ES38B-mount" TransducerSerialNumber="123" '
            'TransducerCustomName="aft" TransducerOffsetX="0.7" '
            'TransducerOffsetY="0.1" TransducerOffsetZ="5.5"/>'
            "</Transducers>"
        )
    return (
        '<Configuration><Header Copyright="c" ApplicationName="EK80" Version="21.15.0"/>'
        + mounts_block
        + "<Transceivers>"
        + "".join(tcvrs)
        + "</Transceivers></Configuration>"
    )


def environment_xml(
    depth=100.0, acidity=8.06, salinity=33.5, sound_speed=1480.0, temperature=9.0
):
    return (
        f'<Environment Depth="{depth}" Acidity="{acidity}" Salinity="{salinity}" '
        f'SoundSpeed="{sound_speed}" Temperature="{temperature}" Latitude="44.5" '
        f'DropKeelOffset="0.0" DropKeelOffsetIsManual="0" WaterLevelDraft="1.5" '
        f'WaterLevelDraftIsManual="0" SoundVelocityProfile="1.0;1480.0;100.0;1480.0" '
        f'SoundVelocitySource="Manual"/>'
    )


def parameter_xml(channel_id, pulse_form, frequency=None, freq_start=None, freq_end=None,
                  pulse_duration=1.024e-3, sample_interval=1 / 93750, transmit_power=150.0,
                  slope=0.0078125):
    freq_attrs = (
        f'Frequency="{frequency}"' if frequency is not None
        else f'FrequencyStart="{freq_start}" FrequencyEnd="{freq_end}"'
    )
    return (
        f'<Parameter><Channel ChannelID="{channel_id}" ChannelMode="0" '
        f'PulseForm="{pulse_form}" {freq_attrs} PulseDuration="{pulse_duration}" '
        f'SampleInterval="{sample_interval}" TransmitPower="{transmit_power}" '
        f'Slope="{slope}"/></Parameter>'
    )


def make_mru0(timestamp, heave, roll, pitch, heading):
    low, high = dt64_to_nt(timestamp)
    body = struct.pack("<4sLLffff", b"MRU0", low, high, heave, roll, pitch, heading)
    return frame(body)


def make_mru1(timestamp, latitude, longitude, floats=None):
    """KMB-format MRU1: status word + lat/lon doubles + 21 attitude/rate/
    error/acceleration floats + delayed-heave tail (ek_raw_parsers.py:559-589)."""
    low, high = dt64_to_nt(timestamp)
    f = list(floats) if floats is not None else [0.5 * i for i in range(21)]
    assert len(f) == 21
    body = struct.pack(
        "<4sLL4sL12sdd" + "f" * 21 + "LLf",
        b"MRU1", low, high, b"KMB#", 0x0001, b"\x00" * 12,
        latitude, longitude, *f, 7, 500, 0.25,
    )
    return frame(body)


def make_fil1(timestamp, channel_id, stage, coefficients, decimation):
    low, high = dt64_to_nt(timestamp)
    coeffs = np.asarray(coefficients, dtype="<c8")
    body = struct.pack(
        "<4sLLh2s128shh",
        b"FIL1",
        low,
        high,
        stage,
        b"",
        channel_id.encode(),
        len(coeffs),
        decimation,
    ) + coeffs.tobytes()
    return frame(body)


def make_raw3(timestamp, channel_id, complex_samples=None, power_idx=None, angle=None,
              complex_f16=False):
    """complex_samples: complex64 [count, n_sectors]; complex_f16 stores the
    real/imag pairs as float16 (data_type bit2) instead of float32 (bit3)."""
    low, high = dt64_to_nt(timestamp)
    data_type = 0
    count = 0
    payload = b""
    if power_idx is not None:
        data_type |= 0b1
        count = len(power_idx)
        payload += np.asarray(power_idx, dtype="<i2").tobytes()
    if angle is not None:
        data_type |= 0b10
        count = len(angle)
        payload += np.asarray(angle, dtype="i1").tobytes()
    if complex_samples is not None:
        cs = np.asarray(complex_samples, dtype="<c8")
        count, n_sec = cs.shape
        if complex_f16:
            data_type |= 0b100 | (n_sec << 8)
            pairs = np.stack([cs.real, cs.imag], axis=-1).astype("<f2")
            payload += pairs.tobytes()
        else:
            data_type |= 0b1000 | (n_sec << 8)
            payload += cs.tobytes()
    body = (
        struct.pack(
            "<4sLL128sh2sll", b"RAW3", low, high, channel_id.encode(), data_type, b"", 0, count
        )
        + payload
    )
    return frame(body)


def make_raw4(timestamp, channel_id, complex_samples):
    """RAW4 transmit-pulse datagram (same layout as RAW3)."""
    from synth_ek60 import dt64_to_nt, frame
    low, high = dt64_to_nt(timestamp)
    cs = np.asarray(complex_samples, dtype="<c8")
    count, n_sec = cs.shape
    data_type = 0b1000 | (n_sec << 8)
    body = (
        struct.pack("<4sLL128sh2sll", b"RAW4", low, high, channel_id.encode(),
                    data_type, b"", 0, count)
        + cs.tobytes()
    )
    return frame(body)


def default_channels():
    return [
        {
            "id": CH_BB,
            "tcvr_type": "WBT",
            "frequency": 70000.0,
            "fmin": 45000.0,
            "fmax": 90000.0,
            "pulse_durations": [256e-6, 512e-6, 1024e-6, 2048e-6, 4096e-6],
            "sample_intervals": [4e-6, 8e-6, 16e-6, 32e-6, 64e-6],
            "gains": [26.0, 26.5, 27.0, 27.5, 28.0],
            "sas": [0.0, -0.05, -0.1, -0.15, -0.2],
            "impedance": 5400,
            "fs": 1500000,
            "cal_freqs": np.linspace(45000, 90000, 10),
            "cal_gains": np.linspace(26.0, 28.0, 10),
        },
        {
            "id": CH_CW,
            "tcvr_type": "WBT",
            "frequency": 120000.0,
            "pulse_durations": [256e-6, 512e-6, 1024e-6],
            "sample_intervals": [8e-6, 16e-6, 32e-6],
            "gains": [24.0, 25.0, 26.0],
            "sas": [0.0, -0.1, -0.2],
            "impedance": 5400,
            "fs": 1500000,
            "cal_freqs": None,
        },
        {
            "id": CH_PW,
            "tcvr_type": "GPT",
            "frequency": 38000.0,
            "pulse_durations": [256e-6, 512e-6, 1024e-6],
            "sample_intervals": [64e-6, 128e-6, 256e-6],
            "gains": [22.0, 23.0, 24.0],
            "sas": [0.0, -0.1, -0.2],
            "impedance": 5400,
            "fs": 500000,
            "cal_freqs": None,
        },
    ]


def write_ek80_raw(
    path,
    n_pings=6,
    n_samples=64,
    n_sectors=4,
    t0=np.datetime64("2021-02-01T00:00:00", "ns"),
    seed=0,
    with_power_channel=True,
    with_cw_complex=True,
    skip_pings=None,
    extra_fm_channel=False,
    complex_f16=False,
    with_raw4=False,
    duplicate_pings=None,
    with_mru=None,
    jitter_config=False,
    nmea_types=None,
    env_fields=None,
):
    """with_mru: None | "mru0" | "mru1" | "both" — interleave motion
    datagrams (MRU0 heave/roll/pitch/heading; MRU1 KMB lat/lon + attitude)
    between pings, randomized from ``seed``.

    jitter_config=True randomizes the per-channel installation fields in the
    configuration XML (beam widths, angle offsets/sensitivities, equivalent
    beam angle, transducer mounting offsets) so cross-channel mixups in the
    ping-invariant beam vars and Platform offsets are detectable."""
    rng = np.random.default_rng(seed)
    channels = default_channels()
    if not with_cw_complex:
        channels = [channels[0], channels[2]]
    if not with_power_channel:
        channels = [c for c in channels if c["tcvr_type"] != "GPT"]
    if extra_fm_channel:
        # insert AFTER the cw/power filtering: the old positional filter
        # ([channels[0], channels[2]] post-insert) silently dropped the
        # extra FM channel whenever with_cw_complex=False (found by the
        # ecs80 soak, which maps ECS T2 onto this channel)
        import copy

        fm2 = copy.deepcopy(channels[0])
        fm2["id"] = "WBT 5512345-15 ES200-7C"
        fm2["frequency"] = 200000.0
        fm2["fmin"], fm2["fmax"] = 160000.0, 260000.0
        fm2["cal_freqs"] = np.linspace(160000, 260000, 10)
        channels.insert(1, fm2)
    if jitter_config:
        for ch in channels:
            ch["eba"] = round(float(rng.uniform(-21.5, -19.5)), 2)
            ch["bw_along"] = round(float(rng.uniform(5.5, 9.0)), 2)
            ch["bw_athwart"] = round(float(rng.uniform(5.5, 9.0)), 2)
            ch["angle_sens_along"] = round(float(rng.uniform(18.0, 28.0)), 2)
            ch["angle_sens_athwart"] = round(float(rng.uniform(18.0, 28.0)), 2)
            ch["angle_offset_along"] = round(float(rng.uniform(-0.5, 0.5)), 3)
            ch["angle_offset_athwart"] = round(float(rng.uniform(-0.5, 0.5)), 3)
            ch["offset_x"] = round(float(rng.uniform(-2.0, 2.0)), 3)
            ch["offset_y"] = round(float(rng.uniform(-2.0, 2.0)), 3)
            ch["offset_z"] = round(float(rng.uniform(0.0, 6.0)), 3)

    chunks = [make_xml0(t0, config_xml(channels)),
              make_xml0(t0, environment_xml(**(env_fields or {})))]
    # filter datagrams: simple averaging filters
    wbt_coeff = np.full(4, 0.25, dtype="c8")
    pc_coeff = np.full(2, 0.5, dtype="c8")
    for ch in channels:
        chunks.append(make_fil1(t0, ch["id"], 1, wbt_coeff, 6))
        chunks.append(make_fil1(t0, ch["id"], 2, pc_coeff, 1))

    truth = {"complex": {}, "power": {}, "ping_time": {}, "channels": [c["id"] for c in channels]}
    for p in range(n_pings):
        ts = t0 + np.timedelta64(p + 1, "s")
        for ch in channels:
            cid = ch["id"]
            if skip_pings and p in skip_pings.get(cid, ()):
                continue
            if ch["tcvr_type"] == "GPT":
                chunks.append(
                    make_xml0(
                        ts,
                        parameter_xml(
                            cid, 0, frequency=ch["frequency"], sample_interval=256e-6,
                            transmit_power=1000.0,
                        ),
                    )
                )
                pw = rng.integers(-20000, 0, n_samples).astype("<i2")
                ang = rng.integers(-50, 50, (n_samples, 2)).astype("i1")
                chunks.append(make_raw3(ts, cid, power_idx=pw, angle=ang))
                if duplicate_pings and p in duplicate_pings.get(cid, ()):
                    # duplicated datagram: same ping_time, same payload (the
                    # real-world duplicate class ek_duplicates dedups)
                    chunks.append(make_raw3(ts, cid, power_idx=pw, angle=ang))
                truth["power"].setdefault(cid, []).append(pw)
            else:
                is_bb = ch["cal_freqs"] is not None
                if is_bb:
                    # FM sweep inside the channel's own band (fmin+5k .. fmax)
                    # — identical to the historical 50k..90k for the default
                    # BB channel, per-channel for extra FM channels (so
                    # cross-channel frequency mixups are detectable)
                    xml = parameter_xml(
                        cid, 1, freq_start=ch["fmin"] + 5000.0,
                        freq_end=ch["fmax"],
                        sample_interval=16e-6, transmit_power=150.0,
                    )
                else:
                    xml = parameter_xml(
                        cid, 0, frequency=ch["frequency"], sample_interval=32e-6,
                        transmit_power=150.0,
                    )
                chunks.append(make_xml0(ts, xml))
                if with_raw4:
                    txp = (
                        rng.normal(0, 1, (max(4, n_samples // 4), 1))
                        + 1j * rng.normal(0, 1, (max(4, n_samples // 4), 1))
                    ).astype("c8")
                    chunks.append(make_raw4(ts, cid, txp))
                cs = (
                    rng.normal(0, 1e-3, (n_samples, n_sectors))
                    + 1j * rng.normal(0, 1e-3, (n_samples, n_sectors))
                ).astype("c8")
                chunks.append(make_raw3(ts, cid, complex_samples=cs,
                                        complex_f16=complex_f16))
                if duplicate_pings and p in duplicate_pings.get(cid, ()):
                    chunks.append(make_raw3(ts, cid, complex_samples=cs,
                                            complex_f16=complex_f16))
                if complex_f16:
                    import numpy as _np
                    pairs = _np.stack([cs.real, cs.imag], axis=-1).astype("<f2")
                    cs = (pairs[..., 0].astype("f8") + 1j * pairs[..., 1].astype("f8")).astype("c8")
                truth["complex"].setdefault(cid, []).append(cs)
            truth["ping_time"].setdefault(cid, []).append(ts)
        if p % 2 == 0:
            if nmea_types:
                # randomized sentence mix (GGA/GLL/RMC) with fuzzed lat/lon
                typ = str(nmea_types[int(rng.integers(0, len(nmea_types)))])
                latd = int(rng.integers(0, 80))
                latm = rng.uniform(0, 59.9999)
                lond = int(rng.integers(0, 170))
                lonm = rng.uniform(0, 59.9999)
                ns = "S" if rng.random() < 0.5 else "N"
                ew = "W" if rng.random() < 0.5 else "E"
                lat_s = f"{latd:02d}{latm:07.4f}"
                lon_s = f"{lond:03d}{lonm:07.4f}"
                if typ == "GGA":
                    sent = (f"$GPGGA,120000,{lat_s},{ns},{lon_s},{ew},"
                            f"1,08,0.9,5.0,M,,M,,")
                elif typ == "GLL":
                    sent = f"$GPGLL,{lat_s},{ns},{lon_s},{ew},120000,A"
                else:  # RMC
                    sent = (f"$GPRMC,120000,A,{lat_s},{ns},{lon_s},{ew},"
                            f"022.4,084.4,230394,003.1,W")
                chunks.append(make_nme0(ts, sent))
            else:
                chunks.append(make_nme0(ts, f"$GPGGA,120000,{44:02d}{p:02d}.5000,N,{125:03d}{p:02d}.2500,W,1,08,0.9,5.0,M,,M,,"))
        if with_mru in ("mru0", "both"):
            chunks.append(make_mru0(
                ts + np.timedelta64(100, "ms"),
                float(rng.normal(0, 0.5)), float(rng.normal(0, 2.0)),
                float(rng.normal(0, 2.0)), float(rng.uniform(0, 360))))
        if with_mru in ("mru1", "both"):
            chunks.append(make_mru1(
                ts + np.timedelta64(200, "ms"),
                float(rng.uniform(-60, 60)), float(rng.uniform(-179, 179)),
                [float(v) for v in rng.normal(0, 1.0, 21)]))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return truth


def write_ek80_multisector(path, beam_type=17, n_pings=4, n_samples=48, seed=21):
    """One CW-complex channel with a 3-sector (beam_type 17) or 3+center
    (49/65/81 -> 4 lanes) transducer; returns the channel id."""
    n_sectors = 3 if beam_type == 17 else 4
    ch = "WBT 600100-15 ES333-3S"
    channels = [{"id": ch, "tcvr_type": "WBT", "frequency": 333000.0,
                 "pulse_durations": [256e-6, 512e-6, 1024e-6],
                 "sample_intervals": [8e-6, 16e-6, 32e-6],
                 "gains": [24.0, 25.0, 26.0], "sas": [0.0, -0.1, -0.2],
                 "impedance": 5400, "fs": 1500000, "cal_freqs": None,
                 "beam_type": beam_type}]
    t0 = np.datetime64("2021-02-01T00:00:00", "ns")
    chunks = [make_xml0(t0, config_xml(channels)), make_xml0(t0, environment_xml())]
    chunks.append(make_fil1(t0, ch, 1, np.full(4, 0.25, dtype="c8"), 6))
    chunks.append(make_fil1(t0, ch, 2, np.full(2, 0.5, dtype="c8"), 1))
    rng = np.random.default_rng(seed)
    for p in range(n_pings):
        ts = t0 + np.timedelta64(p + 1, "s")
        chunks.append(make_xml0(ts, parameter_xml(
            ch, 0, frequency=333000.0, sample_interval=32e-6)))
        cs = (rng.normal(0, 1e-3, (n_samples, n_sectors))
              + 1j * rng.normal(0, 1e-3, (n_samples, n_sectors))).astype("c8")
        chunks.append(make_raw3(ts, ch, complex_samples=cs))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return ch
