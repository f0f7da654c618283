"""EK80 multi-filter_time epoch handling."""

import numpy as np
import pytest

import echopype_tpu as ep

from synth_ek60 import make_nme0
from synth_ek80 import (
    CH_BB,
    CH_CW,
    CH_PW,
    default_channels,
    config_xml,
    environment_xml,
    make_fil1,
    make_raw3,
    make_xml0,
    parameter_xml,
)


def write_two_epoch_ek80(path, n_pings_per_epoch=3, n_samples=64, seed=0,
                         waveform="CW"):
    """Two filter epochs: coefficients change halfway through the file.

    waveform="BB" emits FM (pulse_form=1, FrequencyStart/End) pings on the
    broadband channel instead, so the multi-epoch partition exercises the
    pulse-compressed calibration path."""
    rng = np.random.default_rng(seed)
    bb = waveform in ("BB", "FM")
    ch_id = CH_BB if bb else CH_CW
    channels = [c for c in default_channels() if c["id"] == ch_id]
    t0 = np.datetime64("2021-02-01T00:00:00", "ns")
    chunks = [make_xml0(t0, config_xml(channels)), make_xml0(t0, environment_xml())]

    def emit_filters(ts, wbt_val):
        for ch in channels:
            chunks.append(make_fil1(ts, ch["id"], 1, np.full(4, wbt_val, dtype="c8"), 6))
            chunks.append(make_fil1(ts, ch["id"], 2, np.full(2, 0.5, dtype="c8"), 1))

    emit_filters(t0, 0.25)
    n = 0
    for epoch in range(2):
        if epoch == 1:
            t_mid = t0 + np.timedelta64(100 + n_pings_per_epoch, "s")
            emit_filters(t_mid, 0.20)
        for p in range(n_pings_per_epoch):
            n += 1
            ts = t0 + np.timedelta64(epoch * 200 + p + 1, "s")
            cid = channels[0]["id"]
            if bb:
                pxml = parameter_xml(
                    cid, 1, freq_start=50000.0, freq_end=90000.0,
                    sample_interval=32e-6, transmit_power=150.0,
                )
            else:
                pxml = parameter_xml(
                    cid, 0, frequency=120000.0, sample_interval=32e-6,
                    transmit_power=150.0,
                )
            chunks.append(make_xml0(ts, pxml))
            cs = (
                rng.normal(0, 1e-3, (n_samples, 4)) + 1j * rng.normal(0, 1e-3, (n_samples, 4))
            ).astype("c8")
            chunks.append(make_raw3(ts, cid, complex_samples=cs))
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


@pytest.fixture(scope="module")
def two_epoch_ed(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("epochs")
    path = tmp / "EP-D20210201-T000000.raw"
    write_two_epoch_ek80(path)
    return ep.open_raw(path, sonar_model="EK80")


class TestEpochs:
    def test_two_filter_times_recorded(self, two_epoch_ed):
        ed = two_epoch_ed
        vend = ed["Vendor_specific"]
        assert vend.sizes["filter_time"] == 2
        # both coefficient sets present
        wbt = vend["WBT_coeffs_real"].values
        assert np.nanmax(wbt) == pytest.approx(0.25)
        assert np.nanmin(np.abs(wbt[~np.isnan(wbt)])) == pytest.approx(0.20)

    def test_assume_single_filter_time(self, two_epoch_ed):
        ds = ep.calibrate.compute_Sv(
            two_epoch_ed,
            waveform_mode="CW",
            encode_mode="complex",
            assume_single_filter_time=True,
        )
        assert ds["Sv"].values.shape[1] == 6
        assert np.isfinite(ds["Sv"].values).any()

    def test_epoch_sliced_calibration(self, two_epoch_ed):
        ds = ep.calibrate.compute_Sv(
            two_epoch_ed, waveform_mode="CW", encode_mode="complex"
        )
        sv = ds["Sv"].values
        assert sv.shape[1] == 6  # all pings across both epochs
        assert np.isfinite(sv).any()
        # every ping got calibrated (some samples finite in each ping)
        assert np.isfinite(sv[0]).any(axis=1).all()

    def test_assume_single_rejected_for_ek60(self, tmp_path):
        from synth_ek60 import write_ek60_raw

        path = tmp_path / "E-D20200101-T000000.raw"
        write_ek60_raw(path, n_pings=3, n_samples=20)
        ed = ep.open_raw(path, sonar_model="EK60")
        with pytest.raises(ValueError):
            ep.calibrate.compute_Sv(ed, assume_single_filter_time=True)
