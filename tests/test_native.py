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


class TestNativeGather:
    def test_gather_i16_matches_numpy(self):
        """Native padded gather equals the numpy fallback, incl. unaligned."""
        import numpy as np

        from echopype_tpu import native
        from echopype_tpu.convert.simrad import decode

        if native.load_native() is None:
            import pytest

            pytest.skip("no native toolchain")
        rng = np.random.default_rng(3)
        payload = rng.integers(-32768, 32767, 5000, dtype="<i2").tobytes()
        buf = b"\x01" + payload  # odd leading byte -> unaligned starts
        u8 = np.frombuffer(buf, dtype="u1")
        starts = np.array([1, 201, 1001, 4001], dtype="i8")
        counts = np.array([100, 0, 1500, 400], dtype="i8")
        v_nat, ok_nat = native.gather_i16(u8, starts, counts, 1500)
        # force the numpy path by importing the module-level lanes directly
        lane = np.arange(1500, dtype="i8")
        valid = lane[None, :] < counts[:, None]
        idx = np.where(valid, starts[:, None] + 2 * lane[None, :], 0)
        lo = u8[idx].astype("u2"); hi = u8[idx + 1].astype("u2")
        v_np = (lo | (hi << np.uint16(8))).astype("u2").view("i2").reshape(lo.shape)
        np.testing.assert_array_equal(ok_nat, valid)
        np.testing.assert_array_equal(np.where(valid, v_nat, 0), np.where(valid, v_np, 0))


class TestFusedGathers:
    """The round-2 fused C++ gathers vs straightforward numpy, incl. edges."""

    def _buf(self, rng, n_bytes=4096):
        return rng.integers(0, 256, n_bytes, dtype=np.uint8).tobytes()

    def test_gather_i16_scaled(self):
        from echopype_tpu import native

        rng = np.random.default_rng(0)
        buf = self._buf(rng)
        starts = np.array([0, 100, 801, 3000], dtype="i8")  # incl. odd offset
        counts = np.array([50, 0, 37, 12], dtype="i8")
        scale = 0.0117
        out = native.gather_i16_scaled(buf, starts, counts, 50, scale)
        if out is None:
            pytest.skip("native library unavailable")
        u8 = np.frombuffer(buf, dtype="u1")
        for i, (s, c) in enumerate(zip(starts, counts)):
            want = np.frombuffer(bytes(u8[s : s + 2 * c]), dtype="<i2").astype("f4") * np.float32(scale)
            np.testing.assert_array_equal(out[i, :c], want)
            assert np.isnan(out[i, c:]).all()

    def test_gather_angle(self):
        from echopype_tpu import native

        rng = np.random.default_rng(1)
        buf = self._buf(rng)
        starts = np.array([5, 201], dtype="i8")
        counts = np.array([30, 8], dtype="i8")
        out = native.gather_angle(buf, starts, counts, 30)
        if out is None:
            pytest.skip("native library unavailable")
        u8 = np.frombuffer(buf, dtype="u1")
        for i, (s, c) in enumerate(zip(starts, counts)):
            pairs = u8[s : s + 2 * c].view("i1").reshape(-1, 2).astype("f4")
            np.testing.assert_array_equal(out[i, :c], pairs)
            assert np.isnan(out[i, c:]).all()

    def test_gather_f32_nan(self):
        from echopype_tpu import native

        rng = np.random.default_rng(2)
        vals = rng.normal(size=256).astype("<f4")
        buf = vals.tobytes()
        starts = np.array([0, 64, 1023], dtype="i8")  # incl. unaligned offset
        counts = np.array([16, 200, 1], dtype="i8")
        buf = buf + b"\x00" * 16  # room for the unaligned read
        out = native.gather_f32_nan(buf, starts, counts, 200)
        if out is None:
            pytest.skip("native library unavailable")
        u8 = np.frombuffer(buf, dtype="u1")
        for i, (s, c) in enumerate(zip(starts, counts)):
            want = np.frombuffer(bytes(u8[s : s + 4 * c]), dtype="<f4")
            np.testing.assert_array_equal(out[i, :c], want)
            assert np.isnan(out[i, c:]).all()


class TestF32ToI16:
    def test_matches_numpy_chain(self):
        from echopype_tpu import native

        rng = np.random.default_rng(2)
        src = rng.normal(-50, 20, (64, 257)).astype("f4")
        src[5, :9] = np.nan
        wide = np.zeros((64, 300), dtype="<i2")
        dst = wide[:, :257]
        scale = 1.0 / 0.011758984205624481
        if not native.f32_to_i16_scaled(src, dst, scale):
            import pytest

            pytest.skip("native lib unavailable")
        ref = np.nan_to_num(np.rint(src * np.float32(scale))).astype("i2")
        np.testing.assert_array_equal(dst, ref)
        assert np.all(wide[:, 257:] == 0)

    def test_saturates_and_rejects_bad_layout(self):
        from echopype_tpu import native

        s = np.array([[1e9, -1e9, np.nan]], dtype="f4")
        d = np.zeros((1, 3), "<i2")
        if not native.f32_to_i16_scaled(s, d, 1.0):
            import pytest

            pytest.skip("native lib unavailable")
        assert list(d[0]) == [32767, -32768, 0]
        # column-strided views must be refused (fallback path handles them)
        assert not native.f32_to_i16_scaled(s[:, ::2], d[:, :2], 1.0)
