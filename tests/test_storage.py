"""Tests for the zarr-lite storage layer."""

import json

import numpy as np
import pytest

from echopype_tpu import storage
from echopype_tpu.xrlite import DataArray, Dataset


def make_tree():
    ping_time = np.datetime64("2021-03-01T10:00:00", "ns") + np.arange(7) * np.timedelta64(2, "s")
    beam = Dataset(
        {
            "backscatter_r": (
                ("channel", "ping_time", "range_sample"),
                np.random.default_rng(0).normal(-60, 10, (2, 7, 11)).astype("f4"),
            ),
            "frequency_nominal": ("channel", np.array([18000.0, 38000.0])),
            "sample_interval": (
                ("channel", "ping_time"),
                np.full((2, 7), 2.56e-4),
            ),
        },
        coords={
            "channel": np.array(["GPT 18", "GPT 38"]),
            "ping_time": (("ping_time",), ping_time, {"long_name": "Ping time"}),
            "range_sample": np.arange(11),
        },
        attrs={"beam_mode": "vertical"},
    )
    top = Dataset(attrs={"keywords": "EK60", "conventions": "CF-1.7"})
    env = Dataset(
        {"sound_speed_indicative": ("channel", np.array([1480.0, 1480.0]))},
        coords={"channel": np.array(["GPT 18", "GPT 38"])},
    )
    return {"Top-level": top, "Environment": env, "Sonar/Beam_group1": beam}


class TestZarrLite:
    def test_roundtrip(self, tmp_path):
        tree = make_tree()
        store = tmp_path / "test.zarr"
        storage.write_tree(store, tree)
        back = storage.open_zarr_tree(store)
        assert set(back) == set(tree)
        b0 = tree["Sonar/Beam_group1"]
        b1 = back["Sonar/Beam_group1"]
        np.testing.assert_allclose(b1["backscatter_r"].values, b0["backscatter_r"].values)
        assert b1["backscatter_r"].dims == ("channel", "ping_time", "range_sample")
        np.testing.assert_array_equal(
            b1.coords["ping_time"].values, b0.coords["ping_time"].values
        )
        assert b1.coords["ping_time"].dtype.kind == "M"
        assert b1.attrs["beam_mode"] == "vertical"
        assert back["Top-level"].attrs["keywords"] == "EK60"
        # strings roundtrip
        np.testing.assert_array_equal(b1.coords["channel"].values, b0.coords["channel"].values)

    def test_zarr_v2_metadata_format(self, tmp_path):
        """The on-disk layout must be valid zarr v2 (xarray-readable)."""
        store = tmp_path / "t.zarr"
        storage.write_tree(store, make_tree())
        zarray = json.loads((store / "Sonar/Beam_group1/backscatter_r/.zarray").read_text())
        assert zarray["zarr_format"] == 2
        assert zarray["shape"] == [2, 7, 11]
        # floats default to the reference's Blosc zstd-3 bitshuffle
        # (echopype/utils/coding.py:17-29); zlib-4 when libblosc is absent
        from echopype_tpu.storage import blosc

        if blosc.available():
            assert zarray["compressor"] == {
                "id": "blosc", "cname": "zstd", "clevel": 3, "shuffle": 2,
                "blocksize": 0,
            }
        else:
            assert zarray["compressor"]["id"] == "zlib"
        zattrs = json.loads((store / "Sonar/Beam_group1/backscatter_r/.zattrs").read_text())
        assert zattrs["_ARRAY_DIMENSIONS"] == ["channel", "ping_time", "range_sample"]
        # times encoded as int64 ns since epoch
        tattrs = json.loads((store / "Sonar/Beam_group1/ping_time/.zattrs").read_text())
        assert "since" in tattrs["units"]

    def test_overwrite_guard(self, tmp_path):
        store = tmp_path / "t.zarr"
        storage.write_tree(store, make_tree())
        with pytest.raises(FileExistsError):
            storage.write_tree(store, make_tree())
        storage.write_tree(store, make_tree(), overwrite=True)

    def test_uncompressed(self, tmp_path):
        store = tmp_path / "u.zarr"
        storage.write_tree(store, make_tree(), compress=False)
        back = storage.open_zarr_tree(store)
        assert "Sonar/Beam_group1" in back

    def test_chunked_array_roundtrip(self, tmp_path):
        """Array bigger than one chunk splits and reassembles exactly."""
        from echopype_tpu.storage.zarr_lite import read_array, write_array
        from echopype_tpu.utils import coding

        big = np.arange(3 * 1000 * 7, dtype="f8").reshape(3, 1000, 7)
        orig_target = coding.DEFAULT_CHUNK_BYTES
        coding.DEFAULT_CHUNK_BYTES = 8 * 1000  # force chunking along dim0
        try:
            gdir = tmp_path
            write_array(gdir, "big", big, ("a", "b", "c"), {})
            vals, dims, _ = read_array(gdir / "big")
            np.testing.assert_array_equal(vals, big)
            zarray = json.loads((gdir / "big/.zarray").read_text())
            assert zarray["chunks"][0] < 3 or zarray["chunks"] == [1, 1000, 7]
        finally:
            coding.DEFAULT_CHUNK_BYTES = orig_target


class TestChunkSpec:
    def test_chunk_records_and_applies(self, tmp_path):
        """EchoData.chunk() requests flow into to_zarr encodings."""
        import echopype_tpu as ep
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from synth_ek60 import write_ek60_raw

        raw = tmp_path / "CH-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=20, n_samples=40)
        ed = ep.open_raw(raw, sonar_model="EK60")
        ed.chunk({"ping_time": 7})
        store = tmp_path / "chunked.zarr"
        ed.to_zarr(store)
        meta = json.loads(
            (store / "Sonar/Beam_group1/backscatter_r/.zarray").read_text()
        )
        dims = json.loads(
            (store / "Sonar/Beam_group1/backscatter_r/.zattrs").read_text()
        )["_ARRAY_DIMENSIONS"]
        assert meta["chunks"][dims.index("ping_time")] == 7
        back = ep.open_converted(store)
        np.testing.assert_array_equal(
            np.asarray(back["Sonar/Beam_group1"]["backscatter_r"].values),
            np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values),
        )


class TestGroupTargetedWrites:
    """Round-4 review findings: append modes must update, not clobber."""

    def test_datatree_append_preserves_store(self, tmp_path):
        import numpy as np

        from echopype_tpu.xrlite import Dataset
        from echopype_tpu.xrlite.datatree import DataTree, open_groups

        store = str(tmp_path / "t.zarr")
        DataTree.from_dict(
            {"/": Dataset(attrs={"k": 1}),
             "A": Dataset({"x": (("n",), np.arange(3.0))})}
        ).to_zarr(store, mode="w")
        DataTree.from_dict(
            {"B": Dataset({"y": (("m",), np.arange(2.0))})}
        ).to_zarr(store, mode="a")
        g = open_groups(store)
        assert "/A" in g and "/B" in g
        np.testing.assert_array_equal(g["/A"]["x"].values, np.arange(3.0))

    def test_netcdf_group_update(self, tmp_path):
        import numpy as np

        from echopype_tpu.storage import netcdf4, zarr_lite  # noqa: F401
        from echopype_tpu.xrlite import Dataset

        path = str(tmp_path / "t.nc")
        ds = Dataset({"x": (("n",), np.arange(4.0))}, attrs={"v": 1})
        ds.to_netcdf(path, group="G")
        ds2 = Dataset({"x": (("n",), np.arange(4.0) + 10)}, attrs={"v": 2})
        ds2.to_netcdf(path, mode="a", group="G")
        back = netcdf4.open_netcdf_tree(path)["G"]
        np.testing.assert_array_equal(back["x"].values, np.arange(4.0) + 10)
        assert back.attrs["v"] == 2


class TestStoreArgumentForms:
    """Round-4 self-review: store argument resolution hazards."""

    def test_dataset_to_zarr_pathlib_path(self, tmp_path):
        # pathlib.Path has a .root attribute ("/"); resolving the store via
        # getattr(store, "root", ...) would retarget the write — and
        # mode="w"'s rmtree — at the filesystem root
        from pathlib import Path

        from echopype_tpu.xrlite import Dataset
        from echopype_tpu.xrlite.datatree import dataset_to_zarr, open_dataset

        store = Path(str(tmp_path / "p.zarr"))
        ds = Dataset({"x": (("n",), np.arange(3.0))}, attrs={"k": 7})
        dataset_to_zarr(ds, store, mode="w", group="Provenance")
        assert (store / "Provenance" / "x" / ".zarray").exists()
        back = open_dataset(str(store), group="Provenance")
        np.testing.assert_array_equal(back["x"].values, np.arange(3.0))
        # overwrite again via mode="w" — must wipe only the store dir
        sentinel = tmp_path / "sentinel.txt"
        sentinel.write_text("keep me")
        dataset_to_zarr(ds, store, mode="w", group="Provenance")
        assert sentinel.exists()

    def test_fsmap_store_keeps_remote_fs(self):
        # an fsspec FSMap's .root is a bare path with no protocol; unwrapping
        # must keep the map's own filesystem, not retarget to a local path
        import fsspec

        from echopype_tpu.xrlite import Dataset
        from echopype_tpu.xrlite.datatree import dataset_to_zarr, open_dataset

        mapper = fsspec.get_mapper("memory://fsmap_case/st.zarr")
        ds = Dataset({"x": (("n",), np.arange(4.0))})
        dataset_to_zarr(ds, mapper, mode="w")
        back = open_dataset(mapper)
        np.testing.assert_array_equal(back["x"].values, np.arange(4.0))

    def test_to_netcdf_honors_encoding_argument(self, tmp_path):
        from echopype_tpu.storage import netcdf4
        from echopype_tpu.xrlite import Dataset

        t = np.datetime64("2021-06-01T00:00:00", "ns") + (
            np.arange(4) * np.timedelta64(250, "ms")
        )
        ds = Dataset(coords={"ping_time": t})
        ds["v"] = (("ping_time",), np.arange(4.0))
        path = str(tmp_path / "enc.nc")
        units = "milliseconds since 2021-06-01T00:00:00"
        ds.to_netcdf(path, encoding={"ping_time": {"units": units}})
        import h5py

        with h5py.File(path, "r") as f:
            raw = f["ping_time"][()]
            got_units = f["ping_time"].attrs["units"]
            got_units = got_units.decode() if isinstance(got_units, bytes) else got_units
        assert got_units == units
        np.testing.assert_array_equal(raw, np.arange(4) * 250)
        tree = netcdf4.open_netcdf_tree(path)
        back = tree["Top-level"]
        np.testing.assert_array_equal(
            np.asarray(back.coords["ping_time"].values, dtype="datetime64[ns]"), t
        )
