"""Synthetic AZFP .01A + instrument XML writer for tests."""

import struct

import numpy as np

HEADER_FORMAT = ">HHHHIHHHHHHHHHHHHHHHHHHHHHHHHHHHHHBBBBHBBBBBBBBHHHHHHHHHHHHHHHHHHHH"

FREQS_KHZ = (125, 38)  # stored in header as kHz
PULSE_LEN_US = (300, 500)  # must be in the SV_OFFSET table
DIG_RATE = (64000, 64000)
LOCKOUT = (8, 8)
NUM_BINS = 40
RANGE_SAMPLES_PER_BIN = (4, 4)


def write_azfp_xml(path):
    xml = f"""<?xml version="1.0"?>
<InstrumentInfo>
  <NumFreq>2</NumFreq>
  <SerialNumber>55077</SerialNumber>
  <SensorsFlag PressureSensorInstalled="no"/>
  <ka>0.001</ka><kb>5000.0</kb><kc>5.0</kc>
  <A>0.00123</A><B>0.000234</B><C>0.00000011</C>
  <X_a>0.0</X_a><X_b>0.01</X_b><X_c>0.0</X_c><X_d>0.0</X_d>
  <Y_a>0.0</Y_a><Y_b>0.01</Y_b><Y_c>0.0</Y_c><Y_d>0.0</Y_d>
  <a0>0.0</a0><a1>0.0</a1>
  <DS>0.0246</DS><DS>0.0242</DS>
  <EL>142.1</EL><EL>140.2</EL>
  <TVR>169.8</TVR><TVR>167.3</TVR>
  <VTX0>88.2</VTX0><VTX0>90.1</VTX0>
  <BP>0.0049</BP><BP>0.0088</BP>
</InstrumentInfo>"""
    with open(path, "w") as f:
        f.write(xml)


def write_azfp_xml_refcompat(path):
    """Instrument XML laid out the way real AZFP files are: newline-only text
    between tags (the reference's load_AZFP_xml crashes on indented or
    self-closing layouts, parse_azfp.py:168-177)."""
    leaves = "\n".join(
        [
            "<NumFreq>2</NumFreq>",
            "<SerialNumber>55077</SerialNumber>",
            # instrument metadata consumed by the reference's set_vendor
            # attrs block (set_groups_azfp.py:707-717); InstrumentType is
            # emitted twice so it survives the single-value flattening that
            # its `[0]` access requires
            "<InstrumentType>1</InstrumentType>",
            "<InstrumentType>1</InstrumentType>",
            "<Minor>4</Minor>",
            "<Major>2</Major>",
            "<Date>20210101</Date>",
            "<Program>1</Program>",
            "<cpu>2</cpu>",
            "<BoardVersion>0</BoardVersion>",
            "<FileVersion>5</FileVersion>",
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
            # phase section: real AZFP XML nests per-frequency blocks under
            # <Phases>/<Phase Number=..>; the Number attributes become the
            # frequency_number_phase1 strings set_groups uses in channel ids
            "<Phases>",
            '<Phase Number="1">',
            "<BurstInterval>60</BurstInterval>",
            "<PingsPerBurst>4</PingsPerBurst>",
            "<AverageBurstPings>0</AverageBurstPings>",
            '<Frequency Number="1">',
            "<DigRate>64000</DigRate>",
            "<RangeSamples>40</RangeSamples>",
            "<RangeAveragingSamples>1</RangeAveragingSamples>",
            "<LockOutIndex>0</LockOutIndex>",
            "<Gain>1</Gain>",
            "<StorageFormat>0</StorageFormat>",
            "<PulseLen>300</PulseLen>",
            "</Frequency>",
            '<Frequency Number="2">',
            "<DigRate>64000</DigRate>",
            "<RangeSamples>40</RangeSamples>",
            "<RangeAveragingSamples>1</RangeAveragingSamples>",
            "<LockOutIndex>0</LockOutIndex>",
            "<Gain>1</Gain>",
            "<StorageFormat>0</StorageFormat>",
            "<PulseLen>500</PulseLen>",
            "</Frequency>",
            "</Phase>",
            "</Phases>",
        ]
    )
    with open(path, "w") as f:
        f.write(f'<?xml version="1.0"?>\n<InstrumentInfo>\n{leaves}\n</InstrumentInfo>')


def write_azfp_raw(path, n_pings=5, seed=0, averaged=False, minute=0):
    """Write a synthetic .01A file.

    averaged=True exercises the data_type=1 payload branch: per-bin u32 linear
    sums + u8 overflow counters averaged over ping_per_profile
    (reference parse_azfp.py:455-482).
    """
    rng = np.random.default_rng(seed)
    truth = {"counts": [], "time": []}
    chunks = []
    ping_per_profile = 4 if averaged else 1
    avg_pings = 1 if averaged else 0
    data_type = 1 if averaged else 0
    for p in range(n_pings):
        vals = []
        vals += [64770, p + 1, 55077, 1]  # profile_flag, number, serial, status
        vals += [60]  # burst_int (u4)
        vals += [2021, 3, 15, 10, minute, p, 0]  # y m d h m s hundredths
        vals += list(DIG_RATE) + [0, 0]
        vals += list(LOCKOUT) + [0, 0]
        vals += [NUM_BINS, NUM_BINS, 0, 0]
        vals += list(RANGE_SAMPLES_PER_BIN) + [0, 0]
        vals += [ping_per_profile, avg_pings, 1, 1, 1, 1]  # ppp, avg, acq, period, first, last
        vals += [data_type, data_type, 0, 0]  # data_type x4
        vals += [0]  # data_error
        vals += [1, 0, 2]  # phase, overrun, num_chan
        vals += [1, 1, 0, 0]  # gain x4
        vals += [0]  # spare_chan
        vals += list(PULSE_LEN_US) + [0, 0]
        vals += [1, 2, 0, 0]  # board_num
        vals += list(FREQS_KHZ) + [0, 0]
        vals += [1]  # sensor_flag
        tilt_x_count, tilt_y_count = 100, 200
        battery, pressure_count, temp_count = 30000, 0, 30000
        vals += [tilt_x_count, tilt_y_count, battery, pressure_count, temp_count]
        vals += [20000, 0]  # ad
        chunks.append(struct.pack(HEADER_FORMAT, *vals))
        ping_counts = []
        for ch in range(2):
            if averaged:
                ls = rng.integers(1, 2**31, NUM_BINS).astype(">u4")
                lso = rng.integers(0, 3, NUM_BINS).astype(">u1")
                chunks.append(ls.tobytes())
                chunks.append(lso.tobytes())
                ping_counts.append((ls.astype("f8"), lso.astype("f8")))
            else:
                c = rng.integers(0, 60000, NUM_BINS).astype(">u2")
                chunks.append(c.tobytes())
                ping_counts.append(c.astype("f8"))
        truth["counts"].append(ping_counts)
        truth["time"].append(np.datetime64(f"2021-03-15T10:00:{p:02d}", "ns"))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return truth
