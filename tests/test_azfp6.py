"""AZFP6 (.azfp ULS6) conversion + calibration tests with a synthetic writer."""

import struct

import numpy as np
import pytest

import echopype_tpu as ep

XML_FILE_TYPE = 0xF044CC11
XML_END_FLAG = 0xE088DD66
DATA_START_FLAG = 0xFF01AA00
HEADER_START_FLAG = 0xBCD0
HEADER_END_FLAG = 0xABC1
DATA_END_FLAG = 0xEF02BB66

NUM_BINS = 30
FREQS_KHZ = (125, 38)
PULSE_LEN_US = (300, 500)

# Embedded instrument XML in the layout real ULS6 files carry: newline-only
# text between tags (the reference's load_AZFP_xml iterates child.text and
# crashes on self-closing/indented layouts, parse_azfp6.py:175-185), plus the
# Phases section and instrument metadata its set_vendor consumes.
XML = "\n".join(
    [
        '<?xml version="1.0"?>',
        "<InstrumentInfo>",
        "<NumFreq>2</NumFreq>",
        "<NumPhases>1</NumPhases>",
        "<SerialNumber>60001</SerialNumber>",
        "<InstrumentType>1</InstrumentType>",
        "<InstrumentType>1</InstrumentType>",
        "<Minor>4</Minor>",
        "<Major>2</Major>",
        "<Date>20230101</Date>",
        "<Program>1</Program>",
        "<cpu>2</cpu>",
        "<BoardVersion>0</BoardVersion>",
        "<FileVersion>6</FileVersion>",
        "<ParameterVersion>3</ParameterVersion>",
        "<ConfigurationVersion>2</ConfigurationVersion>",
        '<SensorsFlag PressureSensorInstalled="no">0</SensorsFlag>',
        "<ka>0.001</ka>",
        "<kb>5000.0</kb>",
        "<kc>5.0</kc>",
        "<A>0.00123</A>",
        "<B>0.000234</B>",
        "<C>0.00000011</C>",
        "<X_a>0.0</X_a>",
        "<X_b>0.01</X_b>",
        "<X_c>0.0</X_c>",
        "<X_d>0.0</X_d>",
        "<Y_a>0.0</Y_a>",
        "<Y_b>0.01</Y_b>",
        "<Y_c>0.0</Y_c>",
        "<Y_d>0.0</Y_d>",
        "<a0>0.0</a0>",
        "<a1>0.0</a1>",
        "<DS>0.0246</DS>",
        "<DS>0.0242</DS>",
        "<EL>142.1</EL>",
        "<EL>140.2</EL>",
        "<TVR>169.8</TVR>",
        "<TVR>167.3</TVR>",
        "<VTX0>88.2</VTX0>",
        "<VTX0>90.1</VTX0>",
        "<VTX1>0.0</VTX1>",
        "<VTX1>0.0</VTX1>",
        "<VTX2>0.0</VTX2>",
        "<VTX2>0.0</VTX2>",
        "<VTX3>0.0</VTX3>",
        "<VTX3>0.0</VTX3>",
        "<BP>0.0049</BP>",
        "<BP>0.0088</BP>",
        "<Phases>",
        '<Phase Number="1">',
        "<BurstInterval>60</BurstInterval>",
        "<PingsPerBurst>4</PingsPerBurst>",
        "<AverageBurstPings>0</AverageBurstPings>",
        '<Frequency Number="1">',
        "<DigRate>64000</DigRate>",
        "<RangeSamples>30</RangeSamples>",
        "<RangeAveragingSamples>1</RangeAveragingSamples>",
        "<LockOutIndex>0</LockOutIndex>",
        "<Gain>1</Gain>",
        "<StorageFormat>0</StorageFormat>",
        "<PulseLen>300</PulseLen>",
        "</Frequency>",
        '<Frequency Number="2">',
        "<DigRate>64000</DigRate>",
        "<RangeSamples>30</RangeSamples>",
        "<RangeAveragingSamples>1</RangeAveragingSamples>",
        "<LockOutIndex>0</LockOutIndex>",
        "<Gain>1</Gain>",
        "<StorageFormat>0</StorageFormat>",
        "<PulseLen>500</PulseLen>",
        "</Frequency>",
        "</Phase>",
        "</Phases>",
        "</InstrumentInfo>",
    ]
)


def _rec_u16(vals):
    """Encode one header record: u16 type code (uint16 array) + values."""
    n = len(vals)
    rc = 0x20 | (n - 1)
    return struct.pack("<H", rc) + struct.pack("<" + "H" * n, *vals)


def _rec_u32(vals):
    n = len(vals)
    rc = 0x60 | (n - 1)
    return struct.pack("<H", rc) + struct.pack("<" + "I" * n, *vals)


def write_azfp6_raw(path, n_pings=4, seed=0, num_bins=NUM_BINS, averaged=False,
                    minute=0):
    """Synthesize a ULS6 .azfp file.

    averaged=True exercises the data_type=1 payload branch (per-bin u32
    linear sums + u8 overflow counters averaged over ping_per_profile x
    range_samples_per_bin, reference parse_azfp6.py count decode)."""
    rng = np.random.default_rng(seed)
    chunks = [struct.pack("<I", XML_FILE_TYPE)]
    xml_bytes = XML.encode()
    chunks.append(struct.pack("<I", len(xml_bytes)))
    chunks.append(xml_bytes)
    chunks.append(struct.pack("<I", XML_END_FLAG))
    chunks.append(struct.pack("<I", len(xml_bytes)))
    truth = {"counts": [], "time": []}
    ping_per_profile = 4 if averaged else 1
    avg_pings = 1 if averaged else 0
    dtype_flag = 1 if averaged else 0

    for p in range(n_pings):
        hdr = [struct.pack("<HH", 0x20, HEADER_START_FLAG)]
        fields = [
            ("header_bytes", _rec_u16, [0]),  # placeholder, patched below
            ("header_num_records", _rec_u16, [30]),
            ("profile_number", _rec_u32, [p + 1]),
            ("serial_number", _rec_u16, [60001]),
            ("date", _rec_u16, [2022, 7, 1, 12, minute + p // 60, p % 60, 0]),
            ("acq_status", _rec_u16, [1]),
            ("burst_int", _rec_u32, [60]),
            ("base_time", _rec_u32, [0]),
            ("ping_period", _rec_u16, [1]),
            ("ping_period_counts", _rec_u32, [100]),
            ("ping_per_profile", _rec_u16, [ping_per_profile]),
            ("avg_pings", _rec_u16, [avg_pings]),
            ("num_acq_pings", _rec_u16, [1]),
            ("first_ping", _rec_u16, [1]),
            ("last_ping", _rec_u16, [1]),
            ("data_error", _rec_u16, [0]),
            ("over_run", _rec_u16, [0]),
            ("phase", _rec_u16, [1]),
            ("num_chan", _rec_u16, [2]),
            ("dig_rate", _rec_u16, [64000, 64000]),
            ("lock_out_index", _rec_u16, [8, 8]),
            ("num_bins", _rec_u16, [num_bins, num_bins]),
            ("range_samples_per_bin", _rec_u16, [4, 4]),
            ("data_type", _rec_u16, [dtype_flag, dtype_flag]),
            ("pulse_len", _rec_u16, list(PULSE_LEN_US)),
            ("board_num", _rec_u16, [1, 2]),
            ("frequency", _rec_u16, list(FREQS_KHZ)),
            ("num_sensors", _rec_u16, [5]),
            ("sensor_status", _rec_u16, [1]),
            ("ancillary", _rec_u16, [100, 200, 30000, 0, 30000, 20000, 0]),
            ("last_header_record", _rec_u16, [HEADER_END_FLAG]),
        ]
        body = b"".join(enc(vals) for _, enc, vals in fields)
        header_bytes = 4 + len(body)
        # patch the header_bytes record (first field after the start record)
        fields[0] = ("header_bytes", _rec_u16, [header_bytes])
        body = b"".join(enc(vals) for _, enc, vals in fields)
        hdr.append(body)
        header_blob = b"".join(hdr)

        counts_blobs, ping_counts = [], []
        for ch in range(2):
            if averaged:
                ls = rng.integers(1, 2**31, num_bins).astype("<u4")
                lso = rng.integers(0, 3, num_bins).astype("<u1")
                counts_blobs.append(ls.tobytes() + lso.tobytes())
                ping_counts.append((ls.astype("f8"), lso.astype("f8")))
            else:
                c = rng.integers(0, 60000, num_bins).astype("<u2")
                counts_blobs.append(c.tobytes())
                ping_counts.append(c.astype("f8"))
        payload = header_blob + b"".join(counts_blobs)
        chunks.append(struct.pack("<II", DATA_START_FLAG, len(payload)))
        chunks.append(payload)
        chunks.append(struct.pack("<II", DATA_END_FLAG, len(payload)))
        truth["counts"].append(ping_counts)
        truth["time"].append(
            np.datetime64(f"2022-07-01T12:{minute + p // 60:02d}:{p % 60:02d}", "ns")
        )
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return truth


@pytest.fixture(scope="module")
def azfp6_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("azfp6")
    raw = tmp / "22070100.azfp"
    truth = write_azfp6_raw(raw)
    ed = ep.open_raw(raw, sonar_model="AZFP6")
    return ed, truth


class TestAZFP6:
    def test_tree_and_counts(self, azfp6_ed):
        ed, truth = azfp6_ed
        beam = ed["Sonar/Beam_group1"]
        assert beam["backscatter_r"].shape == (2, 4, NUM_BINS)
        np.testing.assert_allclose(
            beam["frequency_nominal"].values, [38000.0, 125000.0]
        )
        expected_38 = np.stack([t[1] for t in truth["counts"]])
        np.testing.assert_allclose(beam["backscatter_r"].values[0], expected_38)
        np.testing.assert_array_equal(
            beam.coords["ping_time"].values, np.asarray(truth["time"])
        )

    def test_vendor(self, azfp6_ed):
        ed, truth = azfp6_ed
        vend = ed["Vendor_specific"]
        np.testing.assert_allclose(vend["EL"].values, [140.2, 142.1])
        np.testing.assert_allclose(vend["Sv_offset"].values, [1.1, 1.1])
        assert ed["Sonar"].attrs["sonar_software_name"] == "AZFP6"

    def test_calibrate(self, azfp6_ed):
        ed, truth = azfp6_ed
        ds = ep.calibrate.compute_Sv(ed, env_params={"salinity": 33.0, "pressure": 10.0})
        assert np.isfinite(ds["Sv"].values).all()
