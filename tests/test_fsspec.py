"""fsspec-backed remote paths: storage_options is honored end to end.

Reference parity: raw files open through fsspec
(echopype/convert/utils/ek_raw_io.py:102) and stores read/write through
fsspec mappers (utils/io.py:177).  Exercised here against the in-process
memory:// filesystem (the reference's CI uses MinIO for the same contract).
"""

import fsspec
import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.storage import open_dataset, write_dataset

from synth_ek60 import write_ek60_raw


@pytest.fixture()
def mem_raw(tmp_path):
    """Synthesize an EK60 file and copy it into the memory filesystem."""
    local = tmp_path / "MEM-D20200101-T000000.raw"
    write_ek60_raw(local, n_pings=10, n_samples=50)
    fs = fsspec.filesystem("memory")
    url = "memory://raws/MEM-D20200101-T000000.raw"
    with fs.open("/raws/MEM-D20200101-T000000.raw", "wb") as f:
        f.write(local.read_bytes())
    yield url, local
    fs.rm("/raws", recursive=True)


class TestRemoteRaw:
    def test_open_raw_from_memory_url(self, mem_raw):
        url, local = mem_raw
        ed_remote = ep.open_raw(url, sonar_model="EK60")
        ed_local = ep.open_raw(local, sonar_model="EK60")
        np.testing.assert_array_equal(
            np.asarray(ed_remote["Sonar/Beam_group1"]["backscatter_r"].values),
            np.asarray(ed_local["Sonar/Beam_group1"]["backscatter_r"].values),
        )

    def test_missing_remote_raw(self):
        with pytest.raises(FileNotFoundError):
            ep.open_raw("memory://nope/missing.raw", sonar_model="EK60")


class TestRemoteZarr:
    def test_tree_roundtrip_via_memory(self, mem_raw):
        url, local = mem_raw
        ed = ep.open_raw(local, sonar_model="EK60")
        store = "memory://stores/conv.zarr"
        ed.to_zarr(store)
        ed2 = ep.open_converted(store)
        assert set(ed2.group_paths) == set(ed.group_paths)
        np.testing.assert_array_equal(
            np.asarray(ed2["Sonar/Beam_group1"]["backscatter_r"].values),
            np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values),
        )
        pt = np.asarray(ed2["Sonar/Beam_group1"].coords["ping_time"].values)
        assert pt.dtype == np.dtype("datetime64[ns]")
        # overwrite guard holds on remote stores too
        with pytest.raises(FileExistsError):
            ed.to_zarr(store)
        fsspec.filesystem("memory").rm("/stores", recursive=True)

    def test_sv_dataset_roundtrip_via_memory(self, mem_raw):
        url, local = mem_raw
        ed = ep.open_raw(local, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        store = "memory://stores/sv.zarr"
        write_dataset(store, ds)
        ds2 = open_dataset(store)
        np.testing.assert_array_equal(
            np.asarray(ds2["Sv"].values), np.asarray(ds["Sv"].values)
        )
        fsspec.filesystem("memory").rm("/stores", recursive=True)


class TestRemoteNetcdf:
    def test_netcdf_roundtrip_via_memory(self, mem_raw):
        url, local = mem_raw
        ed = ep.open_raw(local, sonar_model="EK60")
        nc = "memory://stores/conv.nc"
        ed.to_netcdf(nc)
        ed2 = ep.open_converted(nc)
        assert set(ed2.group_paths) == set(ed.group_paths)
        np.testing.assert_array_equal(
            np.asarray(ed2["Sonar/Beam_group1"]["backscatter_r"].values),
            np.asarray(ed["Sonar/Beam_group1"]["backscatter_r"].values),
        )
        fsspec.filesystem("memory").rm("/stores", recursive=True)
