"""Blosc zarr-store interop: read stores with the reference's compressors.

The reference writes zarr chunks with Blosc zstd-3 bitshuffle (floats) and
lz4-5 byteshuffle (ints/times/strings) (echopype/utils/coding.py:17-29).
These tests build stores whose chunks are compressed by the real system
libblosc — exactly the bytes numcodecs would produce — and assert our
reader decodes them; plus full write/read roundtrips through our own
blosc-default writer and a clear error for unknown codecs.
"""

import json

import numpy as np
import pytest

from echopype_tpu import storage
from echopype_tpu.storage import blosc
from echopype_tpu.xrlite import Dataset

pytestmark = pytest.mark.skipif(not blosc.available(), reason="libblosc not present")


def _write_raw_blosc_store(root, name, arr, cname, clevel, shuffle):
    """Hand-write a zarr v2 array with libblosc-compressed chunks (the byte
    format numcodecs' Blosc codec produces)."""
    adir = root / name
    adir.mkdir(parents=True)
    meta = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(arr.shape),
        "dtype": arr.dtype.str,
        "compressor": {
            "id": "blosc", "cname": cname, "clevel": clevel,
            "shuffle": shuffle, "blocksize": 0,
        },
        "fill_value": None,
        "order": "C",
        "filters": None,
    }
    (adir / ".zarray").write_text(json.dumps(meta))
    (adir / ".zattrs").write_text(
        json.dumps({"_ARRAY_DIMENSIONS": [f"d{i}" for i in range(arr.ndim)]})
    )
    raw = blosc.compress(
        np.ascontiguousarray(arr).tobytes(), arr.dtype.itemsize, cname, clevel, shuffle
    )
    (adir / ".".join("0" * 1 for _ in range(arr.ndim))).write_bytes(raw)


class TestBloscRead:
    def test_zstd_bitshuffle_float(self, tmp_path):
        """The reference's float default: zstd-3 + bitshuffle."""
        root = tmp_path / "ref.zarr"
        root.mkdir()
        (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
        rng = np.random.default_rng(5)
        arr = rng.normal(-60, 10, (3, 40)).astype("f4")
        _write_raw_blosc_store(root, "Sv", arr, "zstd", 3, blosc.BITSHUFFLE)
        ds = storage.read_group(root)
        np.testing.assert_array_equal(np.asarray(ds["Sv"].values), arr)

    def test_lz4_shuffle_int(self, tmp_path):
        """The reference's int/time default: lz4-5 + byteshuffle."""
        root = tmp_path / "ref.zarr"
        root.mkdir()
        (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
        arr = (np.arange(100, dtype="i8") * 10_000_000) + 1_577_836_800_000_000_000
        _write_raw_blosc_store(root, "times", arr, "lz4", 5, blosc.SHUFFLE)
        ds = storage.read_group(root)
        np.testing.assert_array_equal(np.asarray(ds["times"].values), arr)

    def test_unknown_codec_clear_error(self, tmp_path):
        root = tmp_path / "bad.zarr"
        root.mkdir()
        (root / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
        adir = root / "v"
        adir.mkdir()
        (adir / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4], "chunks": [4], "dtype": "<f4",
            "compressor": {"id": "snappy"}, "fill_value": None,
            "order": "C", "filters": None,
        }))
        (adir / ".zattrs").write_text(json.dumps({"_ARRAY_DIMENSIONS": ["x"]}))
        (adir / "0").write_bytes(b"\x00" * 16)
        with pytest.raises(ValueError, match="snappy"):
            storage.read_group(root)


class TestBloscWriteRoundtrip:
    def test_tree_roundtrip_with_blosc_defaults(self, tmp_path):
        ds = Dataset(coords={"ping_time": np.datetime64("2020-01-01", "ns")
                             + np.arange(50).astype("timedelta64[s]").astype("timedelta64[ns]")})
        rng = np.random.default_rng(6)
        ds["Sv"] = (("ping_time",), rng.normal(-70, 5, 50).astype("f4"))
        ds["count"] = (("ping_time",), np.arange(50, dtype="i4"))
        store = tmp_path / "b.zarr"
        storage.write_tree(store, {"G": ds})
        meta_f = json.loads((store / "G/Sv/.zarray").read_text())
        meta_i = json.loads((store / "G/count/.zarray").read_text())
        assert meta_f["compressor"]["cname"] == "zstd"
        assert meta_f["compressor"]["shuffle"] == blosc.BITSHUFFLE
        assert meta_i["compressor"]["cname"] == "lz4"
        assert meta_i["compressor"]["shuffle"] == blosc.SHUFFLE
        back = storage.open_zarr_tree(store)["G"]
        np.testing.assert_array_equal(back["Sv"].values, ds["Sv"].values)
        np.testing.assert_array_equal(back["count"].values, ds["count"].values)
        np.testing.assert_array_equal(
            back.coords["ping_time"].values, ds.coords["ping_time"].values
        )
