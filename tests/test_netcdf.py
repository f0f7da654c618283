"""netCDF4 (HDF5) output/read tests.

Reference parity: EchoData.to_netcdf (echodata/echodata.py:586) and
open_converted over .nc files (utils/io.py:62, XARRAY_ENGINE_MAP
echodata.py:27).  Validated at two levels: full-tree round trip through the
public API, and h5py-level netCDF4 profile checks (dimension scales,
DIMENSION_LIST wiring, placeholder names, _Netcdf4Dimid).
"""

import h5py
import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.storage import (
    open_netcdf_dataset,
    open_netcdf_tree,
    write_netcdf_dataset,
)

from synth_ek60 import write_ek60_raw


@pytest.fixture()
def ek60_ed(tmp_path):
    path = tmp_path / "NC-D20200101-T000000.raw"
    write_ek60_raw(path, n_pings=8, n_samples=60)
    return ep.open_raw(path, sonar_model="EK60")


def _assert_ds_equal(a, b, group=""):
    assert set(a.coords) == set(b.coords), group
    assert set(a.data_vars) == set(b.data_vars), group
    for name in a.coords:
        va, vb = np.asarray(a.coords[name].values), np.asarray(b.coords[name].values)
        assert a.coords[name].dims == b.coords[name].dims, (group, name)
        if va.dtype.kind in ("U", "O") or vb.dtype.kind in ("U", "O"):
            np.testing.assert_array_equal(va.astype(str), vb.astype(str))
        else:
            np.testing.assert_array_equal(va, vb, err_msg=f"{group}/{name}")
    for name in a.data_vars:
        va, vb = np.asarray(a[name].values), np.asarray(b[name].values)
        assert a[name].dims == b[name].dims, (group, name)
        if va.dtype.kind in ("U", "O") or vb.dtype.kind in ("U", "O"):
            np.testing.assert_array_equal(va.astype(str), vb.astype(str))
        else:
            np.testing.assert_array_equal(va, vb, err_msg=f"{group}/{name}")


class TestNetcdfRoundtrip:
    def test_full_tree_roundtrip(self, ek60_ed, tmp_path):
        nc = tmp_path / "ek60.nc"
        ek60_ed.to_netcdf(nc)
        ed2 = ep.open_converted(nc)
        assert set(ed2.group_paths) == set(ek60_ed.group_paths)
        for g in ek60_ed.group_paths:
            _assert_ds_equal(ek60_ed[g], ed2[g], g)
        assert ed2.sonar_model == "EK60"
        # times come back as datetime64[ns]
        pt = np.asarray(ed2["Sonar/Beam_group1"].coords["ping_time"].values)
        assert pt.dtype == np.dtype("datetime64[ns]")
        # group attrs survive
        assert (
            ed2["Top-level"].attrs.get("keywords")
            == ek60_ed["Top-level"].attrs.get("keywords")
        )

    def test_matches_zarr_roundtrip(self, ek60_ed, tmp_path):
        """netCDF and zarr round trips must agree with each other."""
        nc, zr = tmp_path / "a.nc", tmp_path / "a.zarr"
        ek60_ed.to_netcdf(nc)
        ek60_ed.to_zarr(zr)
        ed_nc, ed_zr = ep.open_converted(nc), ep.open_converted(zr)
        assert set(ed_nc.group_paths) == set(ed_zr.group_paths)
        for g in ed_nc.group_paths:
            _assert_ds_equal(ed_nc[g], ed_zr[g], g)

    def test_overwrite_guard(self, ek60_ed, tmp_path):
        nc = tmp_path / "guard.nc"
        ek60_ed.to_netcdf(nc)
        with pytest.raises(FileExistsError):
            ek60_ed.to_netcdf(nc)
        ek60_ed.to_netcdf(nc, overwrite=True)

    def test_to_file_engine_netcdf4(self, ek60_ed, tmp_path):
        from echopype_tpu.convert.api import to_file

        out = to_file(ek60_ed, "netcdf4", save_path=str(tmp_path / "tofile.nc"))
        assert out.endswith(".nc")
        ed2 = ep.open_converted(out)
        assert "Sonar/Beam_group1" in ed2.group_paths

    def test_sv_dataset_roundtrip(self, ek60_ed, tmp_path):
        ds = ep.calibrate.compute_Sv(ek60_ed)
        nc = tmp_path / "sv.nc"
        write_netcdf_dataset(nc, ds)
        ds2 = open_netcdf_dataset(nc)
        _assert_ds_equal(ds, ds2, "Sv")
        assert ds2.attrs.get("processing_function") == ds.attrs.get("processing_function")


class TestNetcdfProfile:
    """h5py-level checks of the netCDF4-on-HDF5 layout."""

    def test_dimension_scales(self, ek60_ed, tmp_path):
        nc = tmp_path / "prof.nc"
        ek60_ed.to_netcdf(nc)
        with h5py.File(nc, "r") as f:
            beam = f["Sonar/Beam_group1"]
            pt = beam["ping_time"]
            assert pt.attrs["CLASS"] == b"DIMENSION_SCALE"
            assert "_Netcdf4Dimid" in pt.attrs
            # range_sample has no coordinate variable in some groups ->
            # wherever a placeholder exists it carries the netCDF-c NAME
            bs = beam["backscatter_r"]
            dim_names = [
                scale.name.rsplit("/", 1)[-1]
                for i in range(bs.ndim)
                for scale in bs.dims[i].values()
            ]
            assert dim_names == ["channel", "ping_time", "range_sample"]

    def test_placeholder_dim_name(self, tmp_path):
        from echopype_tpu.storage import write_netcdf_tree
        from echopype_tpu.xrlite import Dataset

        ds = Dataset()
        ds["v"] = (("x", "y"), np.arange(6.0).reshape(2, 3))
        nc = tmp_path / "ph.nc"
        write_netcdf_tree(nc, {"G": ds})
        with h5py.File(nc, "r") as f:
            x = f["G/x"]
            nm = x.attrs["NAME"]
            assert nm.startswith(b"This is a netCDF dimension but not a netCDF variable.")
        back = open_netcdf_tree(nc)
        assert back["G"]["v"].dims == ("x", "y")
        np.testing.assert_array_equal(back["G"]["v"].values, np.arange(6.0).reshape(2, 3))
