"""Survey runner: streamed global MVBS equals in-memory compute_MVBS."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.parallel.survey import run_survey_mvbs
from echopype_tpu.utils.profiling import StageTimer

from synth_ek60 import write_ek60_raw


class TestSurveyRunner:
    def test_streamed_equals_combined(self, tmp_path):
        sv_stores = []
        eds = []
        for i in range(3):
            raw = tmp_path / f"V{i}-D2020010{i+1}-T000000.raw"
            write_ek60_raw(
                raw,
                n_pings=25,
                n_samples=80,
                t0=np.datetime64("2020-01-01T00:00:00", "ns") + np.timedelta64(i * 40, "s"),
                seed=i,
            )
            ed = ep.open_raw(raw, sonar_model="EK60")
            eds.append(ed)
            ds_Sv = ep.calibrate.compute_Sv(ed)
            store = tmp_path / f"V{i}_Sv.zarr"
            ds_Sv.to_zarr(store)
            sv_stores.append(str(store))

        timer = StageTimer()
        mvbs_stream = run_survey_mvbs(
            sv_stores, range_bin_m=5.0, ping_time_bin="20s", chunk_pings=10, timer=timer
        )

        # reference: combine then one-shot MVBS
        combined = ep.combine_echodata(eds)
        ds_Sv_all = ep.calibrate.compute_Sv(combined)
        mvbs_ref = ep.commongrid.compute_MVBS(ds_Sv_all, range_bin="5m", ping_time_bin="20s")

        np.testing.assert_array_equal(
            mvbs_stream.coords["ping_time"].values, mvbs_ref.coords["ping_time"].values
        )
        np.testing.assert_allclose(
            mvbs_stream["Sv"].values, mvbs_ref["Sv"].values, atol=1e-4, rtol=0,
            equal_nan=True,
        )
        report = timer.report(log=False)
        assert "device_binning" in report and report["device_binning"]["count"] >= 9

    def test_channel_mismatch_rejected(self, tmp_path):
        raw = tmp_path / "W-D20200101-T000000.raw"
        write_ek60_raw(raw, n_pings=5, n_samples=30)
        ed = ep.open_raw(raw, sonar_model="EK60")
        ds = ep.calibrate.compute_Sv(ed)
        ds2 = ds.isel(channel=[0])
        with pytest.raises(ValueError):
            run_survey_mvbs([ds, ds2])
