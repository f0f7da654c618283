"""combine_echodata tests with synthetic multi-file EK60 surveys."""

import numpy as np
import pytest

import echopype_tpu as ep

from synth_ek60 import write_ek60_raw


def make_eds(tmp_path, n_files=3, n_pings=5, n_samples=40, ragged_widths=None):
    eds = []
    for i in range(n_files):
        path = tmp_path / f"F{i}-D2020010{i+1}-T000000.raw"
        ns = ragged_widths[i] if ragged_widths else n_samples
        write_ek60_raw(
            path,
            n_pings=n_pings,
            n_samples=ns,
            t0=np.datetime64("2020-01-01T00:00:00", "ns") + np.timedelta64(i * 3600, "s"),
            seed=i,
        )
        eds.append(ep.open_raw(path, sonar_model="EK60"))
    return eds


class TestCombine:
    def test_basic_combine(self, tmp_path):
        eds = make_eds(tmp_path)
        combined = ep.combine_echodata(eds)
        beam = combined["Sonar/Beam_group1"]
        assert beam.sizes["ping_time"] == 15
        assert beam.sizes["channel"] == 2
        # data preserved in order
        np.testing.assert_allclose(
            beam["backscatter_r"].values[:, :5],
            eds[0]["Sonar/Beam_group1"]["backscatter_r"].values,
        )
        np.testing.assert_allclose(
            beam["backscatter_r"].values[:, 10:],
            eds[2]["Sonar/Beam_group1"]["backscatter_r"].values,
        )
        # times strictly ordered
        pt = beam.coords["ping_time"].values
        assert (np.diff(pt) > np.timedelta64(0, "ns")).all()

    def test_provenance_table(self, tmp_path):
        eds = make_eds(tmp_path)
        combined = ep.combine_echodata(eds)
        prov = combined["Provenance"]
        assert prov.sizes["echodata_filename"] == 3
        assert prov.attrs["is_combined"]
        assert len(prov["source_filenames"].values) == 3

    def test_ragged_range_padding(self, tmp_path):
        eds = make_eds(tmp_path, ragged_widths=[30, 40, 35])
        combined = ep.combine_echodata(eds)
        beam = combined["Sonar/Beam_group1"]
        assert beam.sizes["range_sample"] == 40
        # shorter file padded with NaN
        assert np.isnan(beam["backscatter_r"].values[0, 0, 35:]).all()

    def test_calibration_of_combined(self, tmp_path):
        eds = make_eds(tmp_path)
        combined = ep.combine_echodata(eds)
        ds_Sv = ep.calibrate.compute_Sv(combined)
        assert ds_Sv["Sv"].values.shape[1] == 15
        # per-file Sv equals combined Sv slices
        sv0 = ep.calibrate.compute_Sv(eds[0])["Sv"].values
        np.testing.assert_allclose(ds_Sv["Sv"].values[:, :5], sv0, atol=1e-5)

    def test_same_file_rejected(self, tmp_path):
        eds = make_eds(tmp_path, n_files=1)
        with pytest.raises(ValueError):
            ep.combine_echodata([eds[0], eds[0]])

    def test_wrong_type_rejected(self):
        with pytest.raises(TypeError):
            ep.combine_echodata(["not an echodata"])

    def test_non_ascending_rejected(self, tmp_path):
        eds = make_eds(tmp_path, n_files=2)
        with pytest.raises(RuntimeError):
            ep.combine_echodata([eds[1], eds[0]])

    def test_channel_selection(self, tmp_path):
        eds = make_eds(tmp_path, n_files=2)
        ch = str(eds[0]["Sonar/Beam_group1"].coords["channel"].values[0])
        combined = ep.combine_echodata(eds, channel_selection=[ch])
        assert combined["Sonar/Beam_group1"].sizes["channel"] == 1

    def test_zarr_roundtrip_combined(self, tmp_path):
        eds = make_eds(tmp_path, n_files=2)
        combined = ep.combine_echodata(eds)
        store = tmp_path / "combined.zarr"
        combined.to_zarr(store)
        back = ep.open_converted(store)
        np.testing.assert_allclose(
            back["Sonar/Beam_group1"]["backscatter_r"].values,
            combined["Sonar/Beam_group1"]["backscatter_r"].values,
        )


class TestUpdatePlatform:
    def test_external_platform_merge(self, tmp_path):
        from echopype_tpu.xrlite import DataArray, Dataset

        eds = make_eds(tmp_path, n_files=1)
        ed = eds[0]
        pt = ed["Sonar/Beam_group1"].coords["ping_time"].values
        ext_time = pt[0] - np.timedelta64(5, "s") + np.arange(10) * np.timedelta64(2, "s")
        ext = Dataset(
            {
                "gps_lat": (("gps_time",), 45.0 + np.arange(10) * 0.001),
                "gps_lon": (("gps_time",), -125.0 + np.arange(10) * 0.001),
            },
            coords={"gps_time": ext_time},
        )
        ed.update_platform(
            ext,
            variable_mappings={"latitude": "gps_lat", "longitude": "gps_lon"},
        )
        plat = ed["Platform"]
        # new timeN dim created, values clipped near the data time range
        tdims = [d for d in plat.sizes if d.startswith("time")]
        assert any(plat["latitude"].dims[0] == d for d in tdims)
        assert np.all(plat["latitude"].values >= 45.0)
        assert plat["latitude"].values.shape == plat.coords[plat["latitude"].dims[0]].values.shape


class TestRecombine:
    def test_combine_already_combined_stores(self, tmp_path):
        """Re-combining combined stores flattens original source files
        (reference combine.py:731-750)."""
        import numpy as np

        from synth_ek60 import write_ek60_raw

        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        stores = []
        for g in range(2):
            eds = []
            for i in range(2):
                raw = tmp_path / f"G{g}F{i}-D20200101-T000000-EK60.raw"
                write_ek60_raw(raw, n_pings=5, n_samples=20,
                               t0=t0 + np.timedelta64((g * 2 + i) * 5, "s"),
                               seed=g * 2 + i)
                eds.append(ep.open_raw(raw, sonar_model="EK60"))
            comb = ep.combine_echodata(eds)
            store = tmp_path / f"combined_{g}.zarr"
            comb.to_zarr(store)
            stores.append(ep.open_converted(store))
        final = ep.combine_echodata(stores)
        bg = final["Sonar/Beam_group1"]
        assert bg.sizes["ping_time"] == 20
        pt = bg.coords["ping_time"].values
        assert (np.diff(pt).astype("i8") > 0).all()
        prov = final["Provenance"]
        srcs = [str(s) for s in np.atleast_1d(prov["source_filenames"].values)]
        assert len(srcs) == 4 and all(s.endswith(".raw") for s in srcs)
        # re-combining flattens to the ORIGINAL per-file rows
        # (reference combine.py:745-750)
        fns = [str(s) for s in np.atleast_1d(prov["echodata_filename"].values)]
        assert len(fns) == 4 and all(f.endswith(".raw") for f in fns)
        assert prov.attrs["is_combined"]


class TestCombineReviewRegressions:
    """Round-4 review findings: differing group sets, input mutation."""

    def test_differing_group_sets(self, tmp_path):
        """Inputs with different groups combine; the Provenance attr table
        keeps one aligned row per input (empty for missing groups) and the
        inputs stay unmutated."""
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        r1 = tmp_path / "GA-D20200101-T000000.raw"
        r2 = tmp_path / "GB-D20200101-T000000.raw"
        write_ek60_raw(r1, n_pings=6, n_samples=20, t0=t0, with_nmea=True)
        write_ek60_raw(r2, n_pings=5, n_samples=20,
                       t0=t0 + np.timedelta64(60, "s"), with_nmea=False, seed=1)
        ed1 = ep.open_raw(r1, sonar_model="EK60")
        ed2 = ep.open_raw(r2, sonar_model="EK60")
        sonar_attrs_before = dict(ed1["Sonar"].attrs)
        top_attrs_before = dict(ed1["Top-level"].attrs)
        comb = ep.combine_echodata([ed1, ed2])
        prov = comb["Provenance"]
        assert len(prov.coords["echodata_filename"].values) == 2
        # inputs not mutated by the merged-attrs assignment
        assert dict(ed1["Sonar"].attrs) == sonar_attrs_before
        assert dict(ed1["Top-level"].attrs) == top_attrs_before
        assert comb["Sonar/Beam_group1"].sizes["ping_time"] == 11

    def test_channel_check_tolerates_missing_group(self):
        """A later input lacking a channel-bearing group must not crash the
        channel-consistency check (our _combine deliberately supports
        differing-group inputs; the reference's own combine crashes here)."""
        from echopype_tpu.echodata.combine import _check_echodata_channels
        from echopype_tpu.xrlite import Dataset

        beam = Dataset(coords={"channel": np.array(["c1", "c2"], dtype=object)})

        class _StubED:
            sonar_model = "EK60"

            def __init__(self, groups):
                self._g = groups

            @property
            def group_paths(self):
                return list(self._g)

            def __getitem__(self, k):
                return self._g[k]

            def get(self, k, default=None):
                return self._g.get(k, default)

        ed1 = _StubED({"Sonar/Beam_group1": beam, "Vendor_specific": beam})
        ed2 = _StubED({"Sonar/Beam_group1": beam})  # no Vendor_specific
        sel = _check_echodata_channels([ed1, ed2])
        assert sel["Sonar/Beam_group1"] is None
