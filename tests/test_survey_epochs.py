"""Multi-filter_time fused BB streaming: device_fused matches the chunked path.

Epoch boundaries follow the reference's partition (filter timestamps that
coincide with valid ping times split the file; calibrate/api.py:96-197).
The fused path runs one device program per (channel, epoch) and must agree
with the chunked per-epoch compute_Sv path bin for bin.
"""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.parallel import run_survey_mvbs_from_raw

from synth_ek80 import (
    CH_BB,
    config_xml,
    default_channels,
    environment_xml,
    make_fil1,
    make_raw3,
    make_xml0,
    parameter_xml,
)


def write_two_epoch_bb(path, n_pings_per_epoch=6, n_samples=96, seed=3):
    """BB channel, two filter epochs; filter timestamps land ON ping
    timestamps so the reference's intersect-based epoch partition engages."""
    rng = np.random.default_rng(seed)
    channels = [c for c in default_channels() if c["id"] == CH_BB]
    t0 = np.datetime64("2021-03-01T00:00:00", "ns")
    chunks = [make_xml0(t0, config_xml(channels)), make_xml0(t0, environment_xml())]
    cid = channels[0]["id"]

    def emit_filters(ts, wbt_val):
        chunks.append(make_fil1(ts, cid, 1, np.full(4, wbt_val, dtype="c8"), 6))
        chunks.append(make_fil1(ts, cid, 2, np.full(2, 0.5, dtype="c8"), 1))

    ping_ts = [t0 + np.timedelta64(p + 1, "s") for p in range(2 * n_pings_per_epoch)]
    emit_filters(ping_ts[0], 0.25)
    emit_filters(ping_ts[n_pings_per_epoch], 0.20)
    for p, ts in enumerate(ping_ts):
        chunks.append(
            make_xml0(
                ts,
                parameter_xml(
                    cid, 1, freq_start=50000.0, freq_end=90000.0,
                    sample_interval=16e-6, transmit_power=150.0,
                ),
            )
        )
        cs = (
            rng.normal(0, 1e-3, (n_samples, 4)) + 1j * rng.normal(0, 1e-3, (n_samples, 4))
        ).astype("c8")
        chunks.append(make_raw3(ts, cid, complex_samples=cs))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


@pytest.fixture(scope="module")
def two_epoch_bb_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fused_epochs")
    path = tmp / "EPOCH-D20210301-T000000.raw"
    write_two_epoch_bb(path)
    return path


class TestFusedMultiEpoch:
    def test_epochs_detected(self, two_epoch_bb_file):
        ed = ep.open_raw(two_epoch_bb_file, sonar_model="EK80")
        assert ed["Vendor_specific"].sizes["filter_time"] == 2

    def test_fused_matches_chunked(self, two_epoch_bb_file):
        kw = dict(
            sonar_model="EK80",
            waveform_mode="BB",
            encode_mode="complex",
            range_bin_m=10.0,
            ping_time_bin="4s",
            chunk_pings=4,  # chunks straddle the epoch boundary
        )
        chunked = run_survey_mvbs_from_raw([two_epoch_bb_file], device_fused=False, **kw)
        fused = run_survey_mvbs_from_raw([two_epoch_bb_file], device_fused=True, **kw)
        cv = chunked["Sv"].values
        fv = fused["Sv"].values
        assert cv.shape == fv.shape
        assert np.array_equal(np.isnan(cv), np.isnan(fv))
        d = np.abs(cv - fv)
        assert np.nanmax(d) < 2e-3, f"fused vs chunked multi-epoch delta {np.nanmax(d)} dB"

    def test_partition_covers_both_epochs(self, two_epoch_bb_file):
        """The epoch partition yields two slices whose ping ranges cover the
        whole file, and the fused streamer produces finite bins in both."""
        from echopype_tpu.calibrate.api import epoch_slice_dicts

        ed = ep.open_raw(two_epoch_bb_file, sonar_model="EK80")
        beam = ed["Sonar/Beam_group1"]
        sds = epoch_slice_dicts(beam, ed["Vendor_specific"])
        assert len(sds) == 2
        fused = run_survey_mvbs_from_raw(
            [two_epoch_bb_file],
            sonar_model="EK80", waveform_mode="BB", encode_mode="complex",
            range_bin_m=10.0, ping_time_bin="2s", device_fused=True,
        )
        sv = fused["Sv"].values[0]
        # every 2 s ping bin (both epochs) holds finite data
        assert np.isfinite(sv).any(axis=1).all()
