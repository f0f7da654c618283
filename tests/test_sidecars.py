"""BOT/IDX sidecar tests: seafloor depths -> Vendor, index data -> Platform."""

import struct

import numpy as np

import echopype_tpu as ep

from synth_ek60 import dt64_to_nt, frame, write_ek60_raw
from synth_ek80 import write_ek80_raw


def make_bot0(timestamp, depths):
    low, high = dt64_to_nt(timestamp)
    d = np.asarray(depths, dtype="<f8")
    body = struct.pack("<4sLLL", b"BOT0", low, high, len(d)) + d.tobytes()
    return frame(body)


def make_idx0(timestamp, ping_number, distance, lat, lon, file_offset):
    low, high = dt64_to_nt(timestamp)
    body = struct.pack(
        "<4sLLLdddL", b"IDX0", low, high, ping_number, distance, lat, lon, file_offset
    )
    return frame(body)


def write_sidecars(raw_path, t0, n, n_chan):
    rng = np.random.default_rng(7)
    depth_truth = rng.uniform(50, 500, (n, n_chan))
    bot = b"".join(
        make_bot0(t0 + np.timedelta64(p + 1, "s"), depth_truth[p]) for p in range(n)
    )
    raw_path.with_suffix(".bot").write_bytes(bot)
    idx = b"".join(
        make_idx0(
            t0 + np.timedelta64(p + 1, "s"), p + 1, 0.01 * p, 44.0 + 0.001 * p,
            -125.0 - 0.001 * p, 4096 * p,
        )
        for p in range(n)
    )
    raw_path.with_suffix(".idx").write_bytes(idx)
    return depth_truth


class TestEK60Sidecars:
    def test_bot_and_idx(self, tmp_path):
        raw = tmp_path / "L0001-D20200101-T000000-EK60.raw"
        t0 = np.datetime64("2020-01-01T00:00:00", "ns")
        write_ek60_raw(raw, n_pings=5, n_samples=20, t0=t0)
        depth_truth = write_sidecars(raw, t0, n=5, n_chan=2)

        ed = ep.open_raw(raw, sonar_model="EK60", include_bot=True, include_idx=True)
        vend = ed["Vendor_specific"]
        assert vend["detected_seafloor_depth"].dims == ("channel", "time3")
        np.testing.assert_allclose(
            vend["detected_seafloor_depth"].values, depth_truth.T
        )
        assert vend.coords["time3"].values[0] == t0 + np.timedelta64(1, "s")
        plat = ed["Platform"]
        np.testing.assert_allclose(plat["ping_number_idx"].values, np.arange(1, 6))
        np.testing.assert_allclose(plat["latitude_idx"].values[2], 44.002)
        np.testing.assert_allclose(plat["vessel_distance_idx"].values[3], 0.03)

    def test_missing_sidecar_raises(self, tmp_path):
        raw = tmp_path / "L0002-D20200101-T000000-EK60.raw"
        write_ek60_raw(raw, n_pings=2, n_samples=10)
        import pytest

        with pytest.raises(FileNotFoundError):
            ep.open_raw(raw, sonar_model="EK60", include_bot=True)


class TestEK80Sidecars:
    def test_bot_in_vendor(self, tmp_path):
        raw = tmp_path / "E80-D20210201-T000000.raw"
        t0 = np.datetime64("2021-02-01T00:00:00", "ns")
        write_ek80_raw(raw, n_pings=4, n_samples=32, t0=t0)
        depth_truth = write_sidecars(raw, t0, n=4, n_chan=3)

        ed = ep.open_raw(raw, sonar_model="EK80", include_bot=True, include_idx=True)
        vend = ed["Vendor_specific"]
        assert vend["detected_seafloor_depth"].dims == ("channel", "time3")
        assert vend["detected_seafloor_depth"].shape == (3, 4)
        # BOT columns are transceiver (config) order; vendor channels are
        # sorted alphabetically -> depths must be remapped per channel
        from synth_ek80 import CH_BB, CH_CW, CH_PW

        config_order = [CH_BB, CH_CW, CH_PW]
        for i, ch in enumerate(vend.coords["channel"].values):
            np.testing.assert_allclose(
                vend["detected_seafloor_depth"].values[i],
                depth_truth[:, config_order.index(str(ch))],
            )
        plat = ed["Platform"]
        np.testing.assert_allclose(plat["file_offset_idx"].values, 4096 * np.arange(4))
