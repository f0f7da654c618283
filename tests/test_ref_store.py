"""Store-format interop differential, both directions.

Direction A: the REFERENCE's own save chain — EchoData.to_zarr →
convert/api.to_file → utils/io.save_file (+ utils/coding set_storage_encodings
/ set_time_encodings) — executes on the facade (backed by our zarr v2 writer),
and OUR open_converted must read the resulting store bit-exact.

Direction B: a store written by OUR EchoData.to_zarr/to_netcdf is opened by
the REFERENCE's EchoData.from_file (facade open_datatree + its legacy-format
checks, echodata/echodata.py:158-257) and must round-trip identically.

Reference chain: utils/io.py:62, utils/coding.py:142-241,
echodata/echodata.py:586-696, convert/api.py:26-200.
"""

import numpy as np
import pytest

import echopype_tpu as ep

from ref_oracle import load_ref_convert_api, load_ref_echodata, make_ref_echodata
from synth_ek60 import write_ek60_raw
from test_ref_echodata import _assert_ds_equal


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    # EchoData.to_zarr lazily imports convert/api (-> core.py's full parser
    # registry); load it through the harness BEFORE the stub blocks it
    load_ref_convert_api()
    tmp = tmp_path_factory.mktemp("ref_store")
    raw = tmp / "ST-D20200101-T000000.raw"
    write_ek60_raw(raw, n_pings=12, n_samples=60, with_nmea=True)
    ed = ep.open_raw(str(raw), sonar_model="EK60")
    return str(raw), ed


class TestReferenceWritesOurReader:
    """Direction A: reference save chain -> our open_converted."""

    def test_zarr(self, converted, tmp_path):
        raw, ed = converted
        layer = load_ref_echodata()
        ref_ed = make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK60", source_file=raw)
        store = str(tmp_path / "refwritten.zarr")
        # the real chain: EchoData.to_zarr -> convert/api.to_file ->
        # io.save_file per group with the reference's zarr encodings
        ref_ed.to_zarr(save_path=store, overwrite=True)
        assert ref_ed.converted_raw_path == store

        ours = ep.open_converted(store)
        assert set(ours.group_paths) == set(ed.group_paths)
        for g in ed.group_paths:
            _assert_ds_equal(ed[g], ours[g], g)

    def test_zarr_encodings_on_disk(self, converted, tmp_path):
        """The store the reference writes carries its own encoding defaults:
        Blosc zstd-3 bitshuffle floats / lz4-5 shuffle otherwise
        (utils/coding.py:17-29), int64-ns times (:11-15)."""
        import json
        from pathlib import Path

        raw, ed = converted
        load_ref_echodata()
        ref_ed = make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK60", source_file=raw)
        store = tmp_path / "refenc.zarr"
        ref_ed.to_zarr(save_path=str(store), overwrite=True)

        meta = json.loads((store / "Sonar/Beam_group1/backscatter_r/.zarray").read_text())
        comp = meta["compressor"]
        assert comp["id"] == "blosc" and comp["cname"] == "zstd" and comp["clevel"] == 3
        assert comp["shuffle"] == 2  # bitshuffle
        tmeta = json.loads((store / "Sonar/Beam_group1/ping_time/.zarray").read_text())
        assert tmeta["dtype"] == "<i8"
        tattrs = json.loads((store / "Sonar/Beam_group1/ping_time/.zattrs").read_text())
        assert "since" in tattrs["units"]
        assert tmeta["compressor"]["cname"] == "lz4"
        assert tmeta["compressor"]["clevel"] == 5
        assert tmeta["compressor"]["shuffle"] == 1  # byte shuffle

    def test_netcdf(self, converted, tmp_path):
        raw, ed = converted
        load_ref_echodata()
        ref_ed = make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK60", source_file=raw)
        path = str(tmp_path / "refwritten.nc")
        ref_ed.to_netcdf(save_path=path, overwrite=True)

        ours = ep.open_converted(path)
        for g in ("Sonar/Beam_group1", "Environment", "Platform", "Vendor_specific"):
            _assert_ds_equal(ed[g], ours[g], g)

    def test_zarr_v3(self, converted, tmp_path, monkeypatch):
        """The reference's save chain writing a Zarr v3 store (what zarr>=3
        produces in the wild, reference requirements.txt:20) read back by our
        open_converted bit-exact."""
        import json

        from echopype_tpu.xrlite import datatree

        raw, ed = converted
        load_ref_echodata()
        ref_ed = make_ref_echodata({g: ed[g] for g in ed.group_paths}, "EK60", source_file=raw)
        store = tmp_path / "refwritten_v3.zarr"
        monkeypatch.setattr(datatree, "DEFAULT_ZARR_FORMAT", 3)
        ref_ed.to_zarr(save_path=str(store), overwrite=True)

        # the store really is a v3 tree: zarr.json nodes, no v2 markers
        assert (store / "zarr.json").exists()
        assert not list(store.rglob(".zgroup")) and not list(store.rglob(".zarray"))
        meta = json.loads(
            (store / "Sonar/Beam_group1/backscatter_r/zarr.json").read_text()
        )
        assert meta["node_type"] == "array"
        blosc_cfg = [c for c in meta["codecs"] if c.get("name") == "blosc"]
        assert blosc_cfg and blosc_cfg[0]["configuration"]["cname"] == "zstd"
        assert blosc_cfg[0]["configuration"]["shuffle"] == "bitshuffle"

        ours = ep.open_converted(str(store))
        assert set(ours.group_paths) == set(ed.group_paths)
        for g in ed.group_paths:
            _assert_ds_equal(ed[g], ours[g], g)


class TestOurWriterReferenceReads:
    """Direction B: our to_zarr/to_netcdf -> reference EchoData.from_file."""

    def _assert_ref_read_matches(self, ref_read, ed):
        for g in ed.group_paths:
            ref_ds = ref_read[g]
            assert ref_ds is not None, g
            _assert_ds_equal(ed[g], ref_ds, g)

    def test_zarr(self, converted, tmp_path):
        raw, ed = converted
        layer = load_ref_echodata()
        store = str(tmp_path / "ourwritten.zarr")
        ed.to_zarr(store)
        ref_read = layer["EchoData"].from_file(store)
        assert ref_read.sonar_model == "EK60"
        self._assert_ref_read_matches(ref_read, ed)

    def test_netcdf(self, converted, tmp_path):
        raw, ed = converted
        layer = load_ref_echodata()
        path = str(tmp_path / "ourwritten.nc")
        ed.to_netcdf(path)
        ref_read = layer["EchoData"].from_file(path)
        self._assert_ref_read_matches(ref_read, ed)

    def test_zarr_v3(self, converted, tmp_path):
        """Direction B on the v3 layout: OUR zarr_format=3 store read through
        the reference's from_file chain (open_datatree + legacy checks)."""
        raw, ed = converted
        layer = load_ref_echodata()
        store = str(tmp_path / "ourwritten_v3.zarr")
        ed.to_zarr(store, zarr_format=3)
        ref_read = layer["EchoData"].from_file(store)
        assert ref_read.sonar_model == "EK60"
        self._assert_ref_read_matches(ref_read, ed)

    def test_open_converted_parity(self, converted, tmp_path):
        """Same store, both readers: reference open_converted (facade) and
        our open_converted agree group-for-group."""
        raw, ed = converted
        layer = load_ref_echodata()
        store = str(tmp_path / "shared.zarr")
        ed.to_zarr(store)
        ref_read = layer["api"].open_converted(store)
        our_read = ep.open_converted(store)
        for g in our_read.group_paths:
            _assert_ds_equal(ref_read[g], our_read[g], g)


class TestRoundTripBothWays:
    def test_ref_store_recombined_by_us(self, tmp_path):
        """A reference-written store re-opened by us can be combined and the
        result matches combining the in-memory originals."""
        layer = load_ref_echodata()
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        eds, reopened = [], []
        for i in range(2):
            raw = tmp_path / f"RT{i}-D20200101-T000000.raw"
            write_ek60_raw(raw, n_pings=6, n_samples=30, t0=t0 + np.timedelta64(i * 60, "s"), seed=i)
            ed = ep.open_raw(str(raw), sonar_model="EK60")
            eds.append(ed)
            ref_ed = make_ref_echodata(
                {g: ed[g] for g in ed.group_paths}, "EK60", source_file=str(raw)
            )
            store = str(tmp_path / f"rt{i}.zarr")
            ref_ed.to_zarr(save_path=store, overwrite=True)
            re_ed = ep.open_converted(store)
            re_ed.source_file = str(raw)
            reopened.append(re_ed)
        comb_mem = ep.combine_echodata(eds)
        comb_store = ep.combine_echodata(reopened)
        for g in ("Sonar/Beam_group1", "Environment", "Platform"):
            _assert_ds_equal(comb_mem[g], comb_store[g], g)


class TestLegacyStoreRead:
    """Pre-DataTree-era stores (Sonar 'channel', Kongsberg Platform/NMEA on
    'time1') are migrated on open by BOTH readers (reference from_file legacy
    checks, echodata/echodata.py:170-243)."""

    def test_legacy_names_migrated(self, converted, tmp_path):
        raw, ed = converted
        store = str(tmp_path / "legacy.zarr")
        # fabricate a legacy-named store from a modern tree
        tree = {g: ed[g] for g in ed.group_paths}
        tree = dict(tree)
        tree["Platform/NMEA"] = tree["Platform/NMEA"].rename({"nmea_time": "time1"})
        from echopype_tpu.storage import zarr_lite

        zarr_lite.write_tree(store, tree, overwrite=True)

        ours = ep.open_converted(store)
        assert "nmea_time" in ours["Platform/NMEA"].coords
        assert "time1" not in ours["Platform/NMEA"].coords

        layer = load_ref_echodata()
        ref_read = layer["EchoData"].from_file(store)
        ref_nmea = ref_read["Platform/NMEA"]
        assert "nmea_time" in ref_nmea.coords
        np.testing.assert_array_equal(
            np.asarray(ours["Platform/NMEA"].coords["nmea_time"].values),
            np.asarray(ref_nmea.coords["nmea_time"].values),
        )


class TestThreeBeamGroupRoundTrip:
    def test_ek80_three_groups_survive_our_store(self, tmp_path):
        """EK80 power + CW-complex + BB channels -> THREE beam groups.

        Inverted finding (store soak): the reference's own to_file saves
        only Beam_group1/Beam_group2 for non-AD2CP models
        (convert/api.py:185-204), silently LOSING the Beam_group3 its own
        SetGroupsEK80 3-way split produces.  Our to_zarr saves every group
        and the reference's from_file reads them all back."""
        from synth_ek80 import write_ek80_raw

        raw = tmp_path / "BG3-D20210201-T000000.raw"
        write_ek80_raw(raw, n_pings=4, n_samples=32, seed=5,
                       with_power_channel=True, with_cw_complex=True)
        ed = ep.open_raw(str(raw), sonar_model="EK80")
        assert "Sonar/Beam_group3" in ed.group_paths

        layer = load_ref_echodata()
        store = str(tmp_path / "ours.zarr")
        ed.to_zarr(store)
        ref_read = layer["EchoData"].from_file(store)
        for g in ed.group_paths:
            assert ref_read[g] is not None, g
            _assert_ds_equal(ed[g], ref_read[g], g)

        ours = ep.open_converted(store)
        assert set(ours.group_paths) == set(ed.group_paths)
