"""Reference-differential parity for the echodata layer.

The reference's REAL echodata modules — EchoData (echodata/echodata.py:43),
combine_echodata (echodata/combine.py:860), update_platform
(echodata.py:349-517), and qc orchestrate_reverse_time_check
(qc/api.py:174-267) — execute on the xrlite facade (incl. the facade
DataTree and the zarr write bridge), fed with trees produced by OUR
conversion pipeline.  Our combine/update_platform/orchestrate must match the
reference output group-for-group.
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import load_ref_echodata, make_ref_echodata
from synth_ek60 import write_ek60_raw

# attrs whose values are stamped at call time or name the implementation;
# both sides must HAVE them, values may differ
VOLATILE_ATTRS = {
    "combination_time",
    "combination_software_name",
    "combination_software_version",
    "processing_software_name",
    "processing_software_version",
    "processing_time",
    # each side converts the raw files in its own pass; second-resolution
    # stamps can straddle a tick
    "conversion_time",
    "date_created",
}


def _norm_missing(x):
    return None if (isinstance(x, float) and np.isnan(x)) else x


def _assert_attrs_equal(ref_attrs, our_attrs, where):
    assert set(ref_attrs) == set(our_attrs), (
        f"{where}: attr keys differ: only-ref={set(ref_attrs) - set(our_attrs)}, "
        f"only-ours={set(our_attrs) - set(ref_attrs)}"
    )
    for k in ref_attrs:
        if k in VOLATILE_ATTRS:
            continue
        rv, ov = _norm_missing(ref_attrs[k]), _norm_missing(our_attrs[k])
        if isinstance(rv, np.ndarray) or isinstance(ov, np.ndarray):
            np.testing.assert_array_equal(np.asarray(rv), np.asarray(ov), err_msg=f"{where}.{k}")
        else:
            assert rv == ov, f"{where}.{k}: {rv!r} != {ov!r}"


def _assert_da_equal(ref_da, our_da, where):
    assert tuple(ref_da.dims) == tuple(our_da.dims), (
        f"{where}: dims {ref_da.dims} != {our_da.dims}"
    )
    r, o = np.asarray(ref_da.values), np.asarray(our_da.values)
    assert r.shape == o.shape, f"{where}: shape {r.shape} != {o.shape}"
    if r.dtype.kind in ("U", "O", "S", "M", "m"):
        np.testing.assert_array_equal(o.astype(str), r.astype(str), err_msg=where)
    else:
        r8, o8 = r.astype("f8"), o.astype("f8")
        np.testing.assert_array_equal(np.isnan(o8), np.isnan(r8), err_msg=where)
        m = ~np.isnan(r8)
        np.testing.assert_array_equal(o8[m], r8[m], err_msg=where)


def _assert_ds_equal(ref_ds, our_ds, group, attrs=True):
    assert set(ref_ds.data_vars) == set(our_ds.data_vars), (
        f"{group}: vars differ: only-ref={set(ref_ds.data_vars) - set(our_ds.data_vars)}, "
        f"only-ours={set(our_ds.data_vars) - set(ref_ds.data_vars)}"
    )
    assert set(ref_ds.coords) == set(our_ds.coords), (
        f"{group}: coords differ: only-ref={set(ref_ds.coords) - set(our_ds.coords)}, "
        f"only-ours={set(our_ds.coords) - set(ref_ds.coords)}"
    )
    # per-file conversion stamps: each side converts the raw files in its own
    # pass, so second-resolution timestamps can legitimately straddle a tick
    volatile_vars = {"conversion_time", "date_created", "processing_time"}
    for name in ref_ds.coords:
        _assert_da_equal(ref_ds.coords[name], our_ds.coords[name], f"{group}/{name}")
    for name in ref_ds.data_vars:
        if name in volatile_vars:
            continue
        _assert_da_equal(ref_ds.data_vars[name], our_ds.data_vars[name], f"{group}/{name}")
    if attrs:
        _assert_attrs_equal(ref_ds.attrs, our_ds.attrs, group)


def _convert(tmp, n_files=3, n_samples=40, pings=(10, 8, 12), gap_s=600):
    """Write n synthetic EK60 files and convert them twice (one tree per
    side, so neither implementation can mutate the other's inputs)."""
    t0 = np.datetime64("2020-01-01T00:00:00", "ns")
    paths = []
    for i in range(n_files):
        raw = tmp / f"REF-D2020010{i + 1}-T000000.raw"
        write_ek60_raw(
            raw, n_pings=pings[i % len(pings)], n_samples=n_samples,
            t0=t0 + np.timedelta64(i * gap_s, "s"), seed=i,
        )
        paths.append(str(raw))
    ours = [ep.open_raw(p, sonar_model="EK60") for p in paths]
    theirs = [ep.open_raw(p, sonar_model="EK60") for p in paths]
    return paths, ours, theirs


def _ref_eds(eds, paths):
    return [
        make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK60", source_file=p)
        for ed, p in zip(eds, paths)
    ]


class TestCombineDifferential:
    def test_combine_all_groups(self, tmp_path):
        """3-file combine: every group matches the reference's combined tree
        (echodata/combine.py:691-857)."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path)
        ref_comb = layer["combine"].combine_echodata(_ref_eds(theirs, paths))
        our_comb = ep.combine_echodata(ours)

        ref_groups = set(ref_comb.group_paths)
        our_groups = set(our_comb.group_paths)
        assert ref_groups == our_groups
        for g in sorted(ref_groups):
            if g == "Provenance":
                continue  # compared separately (volatile combination attrs)
            _assert_ds_equal(ref_comb[g], our_comb[g], g)

        rp, op = ref_comb["Provenance"], our_comb["Provenance"]
        _assert_ds_equal(rp, op, "Provenance", attrs=False)
        _assert_attrs_equal(rp.attrs, op.attrs, "Provenance.attrs")
        # the per-file attr table rows carry their source group
        for name in rp.data_vars:
            assert rp[name].attrs.get("echodata_group") == op[name].attrs.get(
                "echodata_group"
            ), name
        # filenames became a running index; echodata_filename holds basenames
        np.testing.assert_array_equal(
            np.asarray(op.coords["filenames"].values), np.arange(len(paths))
        )
        assert [str(s) for s in op.coords["echodata_filename"].values] == [
            p.rsplit("/", 1)[-1] for p in paths
        ]

    def test_combine_channel_selection_list(self, tmp_path):
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        chan = [str(ours[0]["Sonar/Beam_group1"].coords["channel"].values[0])]
        ref_comb = layer["combine"].combine_echodata(_ref_eds(theirs, paths), channel_selection=chan)
        our_comb = ep.combine_echodata(ours, channel_selection=chan)
        for g in ("Sonar/Beam_group1", "Platform", "Vendor_specific", "Environment"):
            _assert_ds_equal(ref_comb[g], our_comb[g], g)
        assert our_comb["Sonar/Beam_group1"].sizes["channel"] == 1

    def test_combine_channel_selection_dict(self, tmp_path):
        """Dict selection: keys must be beam groups; EK60 gets the union
        everywhere (combine.py:298-380)."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        chans = [str(c) for c in ours[0]["Sonar/Beam_group1"].coords["channel"].values]
        sel = {"Sonar/Beam_group1": [chans[1]]}
        ref_comb = layer["combine"].combine_echodata(_ref_eds(theirs, paths), channel_selection=sel)
        our_comb = ep.combine_echodata(ours, channel_selection=sel)
        for g in ("Sonar/Beam_group1", "Environment", "Vendor_specific"):
            _assert_ds_equal(ref_comb[g], our_comb[g], g)

        with pytest.raises(TypeError):
            ep.combine_echodata(ours, channel_selection={"Environment": chans})
        with pytest.raises(TypeError):
            layer["combine"].combine_echodata(
                _ref_eds(theirs, paths), channel_selection={"Environment": chans}
            )

    def test_combine_ascending_error_parity(self, tmp_path):
        """Descending file order raises RuntimeError on both sides
        (combine.py:458-508)."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        with pytest.raises(RuntimeError):
            layer["combine"].combine_echodata(_ref_eds(theirs[::-1], paths[::-1]))
        with pytest.raises(RuntimeError):
            ep.combine_echodata(ours[::-1])

    def test_combine_vendor_mismatch_error_parity(self, tmp_path):
        """Differing non-append Vendor_specific params raise RuntimeError on
        both sides (combine.py:511-557)."""
        from echopype_tpu.xrlite import DataArray

        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        for eds in (ours, theirs):
            vend = eds[1]["Vendor_specific"]
            name = next(
                n for n, v in vend.data_vars.items()
                if np.issubdtype(v.dtype, np.floating) and "pulse_length_bin" in v.dims
            )
            da = vend.data_vars[name]
            vend.data_vars[name] = DataArray(
                np.asarray(da.values) + 1.0, da.dims, attrs=da.attrs, name=name
            )
        with pytest.raises(RuntimeError, match="[Nn]on identical"):
            layer["combine"].combine_echodata(_ref_eds(theirs, paths))
        with pytest.raises(RuntimeError, match="[Nn]on identical"):
            ep.combine_echodata(ours)

    def test_combine_duplicate_filenames_error_parity(self, tmp_path):
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        # same basename twice
        theirs2 = _ref_eds([theirs[0], theirs[0]], [paths[0], paths[0]])
        with pytest.raises(ValueError):
            layer["combine"].combine_echodata(theirs2)
        ours[1].source_file = ours[0].source_file
        with pytest.raises(ValueError):
            ep.combine_echodata(ours)

    def test_recombine_differential(self, tmp_path):
        """Combining already-combined stores matches the reference: the
        original per-file provenance rows are restored (combine.py:731-750)."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=4, gap_s=600)

        our_c1 = ep.combine_echodata(ours[:2])
        our_c2 = ep.combine_echodata(ours[2:])
        our_final = ep.combine_echodata([our_c1, our_c2])

        ref_eds = _ref_eds(theirs, paths)
        ref_c1 = layer["combine"].combine_echodata(ref_eds[:2])
        ref_c2 = layer["combine"].combine_echodata(ref_eds[2:])
        ref_c1.source_file, ref_c2.source_file = "c1.zarr", "c2.zarr"
        our_c1.source_file, our_c2.source_file = "c1.zarr", "c2.zarr"
        ref_final = layer["combine"].combine_echodata([ref_c1, ref_c2])

        for g in ("Sonar/Beam_group1", "Environment", "Platform"):
            _assert_ds_equal(ref_final[g], our_final[g], g)
        rp, op = ref_final["Provenance"], our_final["Provenance"]
        assert [str(s) for s in rp.coords["echodata_filename"].values] == [
            str(s) for s in op.coords["echodata_filename"].values
        ]
        assert len(op.coords["echodata_filename"].values) == 4
        _assert_ds_equal(rp, op, "Provenance", attrs=False)


    def test_combine_ragged_range_sample_differential(self, tmp_path):
        """Files with differing range_sample lengths combine via xr.concat's
        outer join (shorter files NaN-pad to the union) — the reference does
        this implicitly through xarray alignment (combine.py:804-817); the
        facade concat implements the same join so the oracle covers it."""
        layer = load_ref_echodata()
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        p1 = tmp_path / "RG1-D20200101-T000000.raw"
        p2 = tmp_path / "RG2-D20200102-T000000.raw"
        write_ek60_raw(p1, n_pings=9, n_samples=23, seed=1, ragged=True)
        write_ek60_raw(
            p2, n_pings=8, n_samples=34, seed=2, t0=t0 + np.timedelta64(3600, "s")
        )
        paths = [str(p1), str(p2)]
        ours = [ep.open_raw(p, sonar_model="EK60") for p in paths]
        theirs = [ep.open_raw(p, sonar_model="EK60") for p in paths]
        our_comb = ep.combine_echodata(ours)
        ref_comb = layer["combine"].combine_echodata(_ref_eds(theirs, paths))
        assert ref_comb["Sonar/Beam_group1"].sizes["range_sample"] == 34
        for g in sorted(set(ref_comb.group_paths)):
            if g == "Provenance":
                _assert_ds_equal(ref_comb[g], our_comb[g], g, attrs=False)
            else:
                _assert_ds_equal(ref_comb[g], our_comb[g], g)


    def test_combine_mixed_angle_presence_differential(self, tmp_path):
        """One file carries angle variables, the other is power-only: the
        missing variables NaN-fill for that file's pings (xarray concat
        fill_value semantics the reference inherits), with and without
        channel selection."""
        layer = load_ref_echodata()
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        p1 = tmp_path / "MA1-D20200101-T000000.raw"
        p2 = tmp_path / "MA2-D20200102-T000000.raw"
        write_ek60_raw(p1, n_pings=9, n_samples=18, seed=5)
        write_ek60_raw(
            p2, n_pings=7, n_samples=42, seed=6, ragged=True, with_angle=False,
            t0=t0 + np.timedelta64(600, "s"),
        )
        paths = [str(p1), str(p2)]
        for sel in (None, ["GPT  18 kHz 009072034d45 1-1 ES18-11"]):
            ours = [ep.open_raw(p, sonar_model="EK60") for p in paths]
            theirs = [ep.open_raw(p, sonar_model="EK60") for p in paths]
            ref_comb = layer["combine"].combine_echodata(
                _ref_eds(theirs, paths), channel_selection=sel
            )
            our_comb = ep.combine_echodata(ours, channel_selection=sel)
            ang = np.asarray(
                ref_comb["Sonar/Beam_group1"]["angle_athwartship"].values
            )
            assert np.isnan(ang[:, 9:, :]).all()  # power-only file's rows
            for g in sorted(set(ref_comb.group_paths)):
                _assert_ds_equal(
                    ref_comb[g], our_comb[g], g, attrs=(g != "Provenance")
                )


class TestUpdatePlatformDifferential:
    def _external(self):
        import xarray as xr  # the facade

        t = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(0, 40, 4).astype(
            "timedelta64[s]"
        )
        ds = xr.Dataset(
            {
                "lat": (("time",), 45.0 + 0.001 * np.arange(10)),
                "lon": (("time",), -125.0 + 0.001 * np.arange(10)),
                "PITCH": (("time",), np.sin(np.arange(10.0))),
            },
            coords={"time": t.astype("datetime64[ns]")},
        )
        return ds

    def test_update_platform(self, tmp_path):
        """Reference EchoData.update_platform (echodata.py:349-517) vs ours,
        on identical converted trees + external data."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=1)
        mappings = {"latitude": "lat", "longitude": "lon", "pitch": "PITCH"}

        ref_ed = _ref_eds(theirs, paths)[0]
        ref_ed.update_platform(self._external(), variable_mappings=mappings)
        ref_platform = ref_ed["Platform"]

        ours[0].update_platform(self._external(), variable_mappings=mappings)
        our_platform = ours[0]["Platform"]

        assert set(ref_platform.data_vars) == set(our_platform.data_vars)
        # history attrs embed call-time timestamps; compare values + dims
        for name in ("latitude", "longitude", "pitch"):
            r, o = ref_platform[name], our_platform[name]
            assert tuple(r.dims) == tuple(o.dims), name
            np.testing.assert_array_equal(np.asarray(o.values), np.asarray(r.values), err_msg=name)
        # new time dims created past the existing maximum, old unused dropped
        assert set(ref_platform.dims) == set(our_platform.dims)
        for d in ref_platform.dims:
            if d.startswith("time"):
                np.testing.assert_array_equal(
                    np.asarray(our_platform.coords[d].values),
                    np.asarray(ref_platform.coords[d].values),
                    err_msg=d,
                )


class TestOrchestrateDifferential:
    def _reverse_a_ping(self, beam):
        """Mutate the given Beam_group1 Dataset (pass the stored/tree-node
        object — `ed[...]` on the reference EchoData returns a detached
        view whose coord replacement would not land in the tree)."""
        from echopype_tpu.xrlite import DataArray

        pt = beam.coords["ping_time"].values.copy()
        pt[4] = pt[3] - np.timedelta64(3, "s")
        beam.coords["ping_time"] = DataArray(
            pt, ("ping_time",), attrs=beam.coords["ping_time"].attrs, name="ping_time"
        )

    def test_orchestrate(self, tmp_path):
        """Reference orchestrate_reverse_time_check (qc/api.py:174-267) vs
        ours: corrected in-group times, Provenance old-time arrays and the
        reversed_ping_times flag, plus the zarr-store mirror."""
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=2)
        our_comb = ep.combine_echodata(ours)
        self._reverse_a_ping(our_comb["Sonar/Beam_group1"])
        ref_comb = layer["combine"].combine_echodata(_ref_eds(theirs, paths))
        self._reverse_a_ping(ref_comb._tree["Sonar/Beam_group1"].dataset)

        ref_store = str(tmp_path / "ref_orch.zarr")
        our_store = str(tmp_path / "our_orch.zarr")
        ref_comb.converted_raw_path = ref_store  # silence __del__ swap cleanup

        possible = sorted(
            {"time1", "time2", "time3", "time4", "nmea_time", "ping_time", "filter_time"}
        )
        # seed both stores with the combined tree so mode="r+"/"a" writes land
        our_comb.to_zarr(our_store)
        our_reopen_tree = {g: our_comb[g] for g in our_comb.group_paths}
        from echopype_tpu.storage import zarr_lite

        zarr_lite.write_tree(ref_store, our_reopen_tree, overwrite=True)

        layer["qc"].orchestrate_reverse_time_check(ref_comb, ref_store, possible, {})
        ep.qc.orchestrate_reverse_time_check(our_comb, our_store, possible, {})

        rp, op = ref_comb["Provenance"], our_comb["Provenance"]
        assert rp.attrs["reversed_ping_times"] == 1
        assert op.attrs["reversed_ping_times"] == 1
        old_name = "sonar_beam_group1_old_ping_time"
        # in-memory: the reference adds the old-time var to a DETACHED
        # Provenance view (EchoData.__getitem__ returns to_dataset()), so its
        # tree never receives it — only the store write below lands.  Ours
        # hands out the stored group, so the var persists in memory too.
        assert old_name not in rp.data_vars
        assert old_name in op.data_vars
        # corrected time monotonic in ours; reference's detached-write quirk
        # leaves its in-memory tree corrected too (same code path)
        assert not ep.qc.exist_reversed_time(our_comb["Sonar/Beam_group1"], "ping_time")

        # store mirrors: Provenance old-time array + flag present in BOTH
        for store in (ref_store, our_store):
            prov = zarr_lite.read_group(store, "Provenance")
            assert old_name in prov.data_vars, store
            assert prov.attrs["reversed_ping_times"] == 1, store
        np.testing.assert_array_equal(
            np.asarray(zarr_lite.read_group(ref_store, "Provenance")[old_name].values),
            np.asarray(zarr_lite.read_group(our_store, "Provenance")[old_name].values),
        )
        # ours persists the CORRECTED time into the group store (the
        # reference's literal code re-reads the tree and writes the stale
        # one — see qc/api.py docstring); assert ours is monotonic on disk
        bg = zarr_lite.read_group(our_store, "Sonar/Beam_group1")
        pt = np.asarray(bg.coords["ping_time"].values, dtype="datetime64[ns]")
        assert (np.diff(pt) > np.timedelta64(0, "ns")).all()


class TestCombineEK80Differential:
    """EK80 combine: multi-beam-group trees exercise the EK80-specific
    channel-selection-dict branch (Sonar/Platform/Vendor get the union of
    the dict values; each beam group gets its own list —
    combine.py:360-374)."""

    def _convert_ek80(self, tmp_path, n=2):
        from synth_ek80 import write_ek80_raw

        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        paths, ours, theirs = [], [], []
        for i in range(n):
            raw = tmp_path / f"K80-{i}-D20210201-T000000.raw"
            write_ek80_raw(raw, n_pings=6, n_samples=32, seed=i,
                           t0=t0 + np.timedelta64(20 * i, "s"))
            paths.append(str(raw))
            ours.append(ep.open_raw(str(raw), sonar_model="EK80"))
            theirs.append(ep.open_raw(str(raw), sonar_model="EK80"))
        return paths, ours, theirs

    def _ref_eds(self, eds, paths):
        return [
            make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK80", source_file=p)
            for ed, p in zip(eds, paths)
        ]

    def test_combine_all_groups(self, tmp_path):
        layer = load_ref_echodata()
        paths, ours, theirs = self._convert_ek80(tmp_path)
        ref_comb = layer["combine"].combine_echodata(self._ref_eds(theirs, paths))
        our_comb = ep.combine_echodata(ours)
        assert set(ref_comb.group_paths) == set(our_comb.group_paths)
        # multiple beam groups must be present (complex + power split)
        beam_groups = [g for g in our_comb.group_paths if "Beam_group" in g]
        assert len(beam_groups) >= 2, beam_groups
        for g in sorted(set(ref_comb.group_paths)):
            if g == "Provenance":
                _assert_ds_equal(ref_comb[g], our_comb[g], g, attrs=False)
                _assert_attrs_equal(ref_comb[g].attrs, our_comb[g].attrs, g)
            else:
                _assert_ds_equal(ref_comb[g], our_comb[g], g)

    def test_combine_beam_group_dict_selection(self, tmp_path):
        """Per-beam-group dict (must name EVERY beam group — the reference
        indexes the dict for each, combine.py:368): each group keeps only
        its list; Sonar/Platform/Vendor_specific keep the union
        (combine.py:360-374)."""
        layer = load_ref_echodata()
        paths, ours, theirs = self._convert_ek80(tmp_path)
        beam_groups = [g for g in ours[0].group_paths if "Beam_group" in g]
        sel = {
            g: [str(c) for c in ours[0][g].coords["channel"].values]
            for g in beam_groups
        }
        # narrow one multi-channel beam group to a single channel
        narrowed = next((g for g in beam_groups if len(sel[g]) > 1), beam_groups[0])
        sel[narrowed] = sel[narrowed][:1]
        ref_comb = layer["combine"].combine_echodata(
            self._ref_eds(theirs, paths), channel_selection=dict(sel)
        )
        our_comb = ep.combine_echodata(ours, channel_selection=dict(sel))
        for g in beam_groups + ["Vendor_specific", "Environment", "Platform"]:
            _assert_ds_equal(ref_comb[g], our_comb[g], g)
        assert our_comb[narrowed].sizes["channel"] == 1

        # a dict missing a beam group fails identically on both sides
        partial = {beam_groups[0]: sel[beam_groups[0]]}
        if len(beam_groups) > 1:
            with pytest.raises(KeyError):
                layer["combine"].combine_echodata(
                    self._ref_eds(theirs, paths), channel_selection=dict(partial)
                )
            with pytest.raises(KeyError):
                ep.combine_echodata(ours, channel_selection=dict(partial))


class TestCombineAD2CPDifferential:
    """AD2CP combine: multiple beam groups with beam/echogram dims, vendor
    diagnostics on time1, env/platform on time1/time2."""

    def test_combine_all_groups(self, tmp_path):
        from test_ad2cp import write_ad2cp

        layer = load_ref_echodata()
        paths, ours, theirs = [], [], []
        for i in range(2):
            raw = tmp_path / f"AD{i}.ad2cp"
            write_ad2cp(str(raw), n_pings=4, minute=i)
            paths.append(str(raw))
            ours.append(ep.open_raw(str(raw), sonar_model="AD2CP"))
            theirs.append(ep.open_raw(str(raw), sonar_model="AD2CP"))
        ref_comb = layer["combine"].combine_echodata(
            [
                make_ref_echodata(
                    {g: ed[g] for g in ed.group_paths}, "AD2CP", source_file=p
                )
                for ed, p in zip(theirs, paths)
            ]
        )
        our_comb = ep.combine_echodata(ours)
        assert set(ref_comb.group_paths) == set(our_comb.group_paths)
        for g in sorted(set(ref_comb.group_paths)):
            if g == "Provenance":
                _assert_ds_equal(ref_comb[g], our_comb[g], g, attrs=False)
            else:
                _assert_ds_equal(ref_comb[g], our_comb[g], g)
        assert our_comb["Sonar/Beam_group1"].sizes["ping_time"] == 8
        assert our_comb["Vendor_specific"].sizes["time1"] == 8


class TestUpdatePlatformEdgeDifferential:
    """update_platform edge branches vs the reference: CF trajectory input
    (echodata.py:394-414), scalar lat/lon stamped at the first ping time
    (:494-505), lat-without-lon ValueError, unknown mappings dropped."""

    def _trajectory_ds(self):
        import xarray as xr

        t = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(0, 40, 4).astype(
            "timedelta64[s]"
        )
        n = len(t)
        # Saildrone-style CF layout: trajectory is its own size-1 dimension
        ds = xr.Dataset(
            {
                "lat": (("trajectory", "obs"), (45.0 + 0.001 * np.arange(n))[None]),
                "lon": (("trajectory", "obs"), (-125.0 + 0.001 * np.arange(n))[None]),
            },
            coords={
                "trajectory": (
                    ("trajectory",),
                    np.array([1001.0]),
                    {"cf_role": "trajectory_id"},
                ),
                "time": (("trajectory", "obs"), t[None], {"standard_name": "time"}),
            },
            attrs={"featureType": "trajectory"},
        )
        return ds

    def test_trajectory_input(self, tmp_path):
        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=1)
        mappings = {"latitude": "lat", "longitude": "lon"}
        ref_ed = _ref_eds(theirs, paths)[0]
        ref_ed.update_platform(self._trajectory_ds(), variable_mappings=mappings)
        ours[0].update_platform(self._trajectory_ds(), variable_mappings=mappings)
        rp, op = ref_ed["Platform"], ours[0]["Platform"]
        for name in ("latitude", "longitude"):
            np.testing.assert_array_equal(
                np.asarray(op[name].values), np.asarray(rp[name].values), err_msg=name
            )
            assert tuple(op[name].dims) == tuple(rp[name].dims), name
        assert set(rp.dims) == set(op.dims)

    def test_scalar_latlon(self, tmp_path):
        """No-GPS file: Platform lat/lon is a size-1 NaN placeholder, which
        is the only shape the reference's scalar-assign branch fits (it
        writes a 1-element array into the existing variable)."""
        import xarray as xr

        layer = load_ref_echodata()
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        raw = tmp_path / "SCAL-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=6, n_samples=30, t0=t0, with_nmea=False)
        paths = [str(raw)]
        ours = [ep.open_raw(str(raw), sonar_model="EK60")]
        theirs = [ep.open_raw(str(raw), sonar_model="EK60")]
        ext = xr.Dataset({"lat": ((), np.float64(45.5)), "lon": ((), np.float64(-125.5))})
        mappings = {"latitude": "lat", "longitude": "lon"}
        ref_ed = _ref_eds(theirs, paths)[0]
        ref_ed.update_platform(ext, variable_mappings=mappings)
        ours[0].update_platform(ext, variable_mappings=mappings)
        rp, op = ref_ed["Platform"], ours[0]["Platform"]
        for name in ("latitude", "longitude"):
            rv, ov = np.atleast_1d(rp[name].values), np.atleast_1d(op[name].values)
            np.testing.assert_array_equal(ov, rv, err_msg=name)
            assert len(ov) == 1
            # the reference's first-ping-time coord restamp is silently
            # dropped by dataset-assignment alignment; both sides keep the
            # original placeholder stamp
            r_t = np.asarray(rp.coords[rp[name].dims[0]].values, dtype="datetime64[ns]")
            o_t = np.asarray(op.coords[op[name].dims[0]].values, dtype="datetime64[ns]")
            np.testing.assert_array_equal(o_t, r_t, err_msg=name)

    def test_lat_without_lon_raises(self, tmp_path):
        import xarray as xr

        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=1)
        t = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(5).astype("timedelta64[s]")
        ext = xr.Dataset(
            {"lat": (("time",), 45.0 + np.arange(5.0))},
            coords={"time": t},
        )
        ref_ed = _ref_eds(theirs, paths)[0]
        with pytest.raises(ValueError, match="[Oo]nly one of"):
            ref_ed.update_platform(ext, variable_mappings={"latitude": "lat"})
        with pytest.raises(ValueError, match="[Oo]nly one of"):
            ours[0].update_platform(ext, variable_mappings={"latitude": "lat"})

    def test_unknown_mapping_dropped(self, tmp_path):
        import xarray as xr

        layer = load_ref_echodata()
        paths, ours, theirs = _convert(tmp_path, n_files=1)
        t = np.datetime64("2020-01-01T00:00:00", "ns") + np.arange(5).astype("timedelta64[s]")
        ext = xr.Dataset(
            {"bogus": (("time",), np.arange(5.0))}, coords={"time": t}
        )
        ref_ed = _ref_eds(theirs, paths)[0]
        ref_ed.update_platform(ext, variable_mappings={"not_a_platform_var": "bogus"})
        ours[0].update_platform(ext, variable_mappings={"not_a_platform_var": "bogus"})
        assert "not_a_platform_var" not in ref_ed["Platform"].data_vars
        assert "not_a_platform_var" not in ours[0]["Platform"].data_vars


class TestCombineAZFPDifferential:
    """AZFP combine: profile data on ping_time, env on ping_time, vendor
    constants identical across files (Vendor identity check must pass)."""

    def test_combine_all_groups(self, tmp_path):
        from synth_azfp import write_azfp_raw, write_azfp_xml

        layer = load_ref_echodata()
        xml = tmp_path / "cfg.XML"
        write_azfp_xml(xml)
        paths, ours, theirs = [], [], []
        for i in range(2):
            raw = tmp_path / f"210315{i:02d}.01A"
            write_azfp_raw(str(raw), n_pings=4, minute=i, seed=i)
            paths.append(str(raw))
            ours.append(ep.open_raw(str(raw), sonar_model="AZFP", xml_path=str(xml)))
            theirs.append(ep.open_raw(str(raw), sonar_model="AZFP", xml_path=str(xml)))
        ref_comb = layer["combine"].combine_echodata(
            [
                make_ref_echodata(
                    {g: ed[g] for g in ed.group_paths}, "AZFP", source_file=p
                )
                for ed, p in zip(theirs, paths)
            ]
        )
        our_comb = ep.combine_echodata(ours)
        assert set(ref_comb.group_paths) == set(our_comb.group_paths)
        for g in sorted(set(ref_comb.group_paths)):
            _assert_ds_equal(ref_comb[g], our_comb[g], g, attrs=(g != "Provenance"))
        assert our_comb["Sonar/Beam_group1"].sizes["ping_time"] == 8
