"""Native C++ ingest scanner: parity with the Python reference walk."""

import numpy as np
import pytest

from echopype_tpu.convert.simrad import framing
from echopype_tpu.native import load_native, scan_datagrams_native

from synth_ek60 import write_ek60_raw

pytestmark = pytest.mark.skipif(load_native() is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def raw_bytes(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "N-D20200101-T000000.raw"
    write_ek60_raw(p, n_pings=50, n_samples=64)
    return p.read_bytes()


class TestNativeScan:
    def test_parity_clean(self, raw_bytes):
        a = framing.scan_datagrams(raw_bytes, use_native=True)
        b = framing.scan_datagrams(raw_bytes, use_native=False)
        np.testing.assert_array_equal(a.body_offset, b.body_offset)
        np.testing.assert_array_equal(a.size, b.size)
        np.testing.assert_array_equal(a.dgram_type, b.dgram_type)
        np.testing.assert_array_equal(a.timestamp, b.timestamp)

    def test_parity_corrupted(self, raw_bytes):
        buf = bytearray(raw_bytes)
        buf[600:610] = b"\x00" * 10
        a = framing.scan_datagrams(bytes(buf), use_native=True)
        b = framing.scan_datagrams(bytes(buf), use_native=False)
        np.testing.assert_array_equal(a.body_offset, b.body_offset)

    def test_no_resync_raises(self, raw_bytes):
        buf = bytearray(raw_bytes)
        buf[0:4] = b"\xff\xff\xff\xff"
        with pytest.raises(framing.CorruptDatagramError):
            framing.scan_datagrams(bytes(buf), resync=False, use_native=True)

    def test_empty(self):
        out = scan_datagrams_native(b"")
        assert out is not None and len(out[0]) == 0
