"""metrics and qc tests with analytic oracles."""

import numpy as np
import pytest

import echopype_tpu as ep
from echopype_tpu.xrlite import DataArray, Dataset


def make_sv(sv_db, dr=0.5):
    """sv_db: [n_ping, n_r]."""
    sv_db = np.asarray(sv_db, dtype="f8")[None, ...]
    n_ch, n_ping, n_r = sv_db.shape
    er = np.broadcast_to(np.arange(n_r) * dr, sv_db.shape).copy()
    return Dataset(
        {
            "Sv": (("channel", "ping_time", "range_sample"), sv_db),
            "echo_range": (("channel", "ping_time", "range_sample"), er),
        },
        coords={
            "channel": np.array(["ch0"], dtype=object),
            "ping_time": np.datetime64("2020-01-01", "ns")
            + np.arange(n_ping) * np.timedelta64(1, "s"),
            "range_sample": np.arange(n_r),
        },
    )


class TestMetrics:
    def test_abundance_uniform(self):
        """Constant sv over H meters: Sa = Sv + 10log10(H)."""
        n_r, dr = 101, 0.5
        ds = make_sv(np.full((3, n_r), -60.0), dr=dr)
        sa = ep.metrics.abundance(ds)
        H = (n_r - 1) * dr
        np.testing.assert_allclose(sa.values, -60.0 + 10 * np.log10(H), atol=1e-9)

    def test_center_of_mass_uniform(self):
        """Uniform distribution: CM at the midpoint of the insonified range."""
        n_r, dr = 101, 0.5
        ds = make_sv(np.full((2, n_r), -60.0), dr=dr)
        cm = ep.metrics.center_of_mass(ds)
        # samples 1..100 at depth 0.5..50 -> mean 25.25
        np.testing.assert_allclose(cm.values, np.mean(np.arange(1, n_r) * dr), atol=1e-9)

    def test_dispersion_uniform(self):
        n_r, dr = 101, 0.5
        ds = make_sv(np.full((1, n_r), -60.0), dr=dr)
        disp = ep.metrics.dispersion(ds)
        z = np.arange(1, n_r) * dr
        np.testing.assert_allclose(disp.values, np.var(z), atol=1e-9)

    def test_evenness_aggregation(self):
        """Uniform sv: EA = total height; IA = 1/EA."""
        n_r, dr = 101, 0.5
        ds = make_sv(np.full((1, n_r), -60.0), dr=dr)
        ev = ep.metrics.evenness(ds)
        H = (n_r - 1) * dr
        np.testing.assert_allclose(ev.values, H, atol=1e-9)
        np.testing.assert_allclose(ep.metrics.aggregation(ds).values, 1 / H, atol=1e-12)

    def test_peaked_distribution(self):
        """A single hot sample pulls CM toward it and shrinks evenness."""
        n_r = 50
        sv = np.full((1, n_r), -90.0)
        sv[0, 30] = -30.0
        ds = make_sv(sv)
        cm = ep.metrics.center_of_mass(ds)
        np.testing.assert_allclose(cm.values, 30 * 0.5, atol=0.2)
        assert ep.metrics.evenness(ds).values < 2.0

    def test_missing_range_label(self):
        ds = make_sv(np.full((1, 10), -60.0))
        with pytest.raises(ValueError):
            ep.metrics.abundance(ds, range_label="depth")


class TestQC:
    def _times_with_reversal(self):
        t = np.datetime64("2020-01-01", "ns") + np.arange(50) * np.timedelta64(1, "s")
        t[20] = t[19] - np.timedelta64(5, "s")  # one reversed ping
        return t

    def test_exist_reversed(self):
        t = self._times_with_reversal()
        ds = Dataset(coords={"ping_time": t})
        assert ep.qc.exist_reversed_time(ds, "ping_time")
        ds2 = Dataset(coords={"ping_time": np.sort(t)})
        assert not ep.qc.exist_reversed_time(ds2, "ping_time")

    def test_coerce_fixes_forward_flow(self):
        t = self._times_with_reversal()
        ds = Dataset(coords={"ping_time": t})
        ep.qc.coerce_increasing_time(ds, win_len=10)
        fixed = ds.coords["ping_time"].values
        assert not (np.diff(fixed) < np.timedelta64(0, "ns")).any()
        # pre-reversal times untouched
        np.testing.assert_array_equal(fixed[:20], t[:20])
        # the repaired interval equals the local median interval (1 s)
        assert fixed[20] - fixed[19] == np.timedelta64(1, "s")

    def test_intervals_preserved_after_repair(self):
        t = self._times_with_reversal()
        ds = Dataset(coords={"ping_time": t})
        ep.qc.coerce_increasing_time(ds, win_len=10)
        fixed = ds.coords["ping_time"].values
        # deltas after the repair point keep their original values
        orig_deltas = np.diff(t)[21:]
        np.testing.assert_array_equal(np.diff(fixed)[21:], orig_deltas)

    def test_reversal_at_first_interval(self):
        """A reversal at the VERY FIRST interval has no prior window — the
        reference's _clean_reversed raises IndexError there (qc/api.py:23,
        found by the metrics soak).  Ours repairs from the forward cadence
        instead: the first interval becomes the median of the following
        nonnegative diffs and the result flows forward."""
        t = np.datetime64("2020-01-01", "ns") + np.arange(12) * np.timedelta64(2, "s")
        t[1] = t[0] - np.timedelta64(7, "s")
        # keep later deltas intact: only diff[0] (and diff[1], which the
        # reversal made large) differ from the 2 s cadence
        ds = Dataset(coords={"ping_time": t.copy()})
        ep.qc.coerce_increasing_time(ds, win_len=5)
        fixed = ds.coords["ping_time"].values
        assert not (np.diff(fixed) < np.timedelta64(0, "ns")).any()
        assert fixed[0] == t[0]
        # repaired first interval = median of the following window's
        # nonnegative diffs (9 s, 2 s, 2 s, 2 s, 2 s -> 2 s)
        assert fixed[1] - fixed[0] == np.timedelta64(2, "s")

    def test_adjacent_reversals_at_start_stay_monotone(self):
        """Multiple reversals whose local windows are dominated by OTHER
        reversed diffs must still repair to a monotone axis in the
        first-interval (reference-crash) regime — the plain prior-window
        median there is itself negative and silently re-corrupted the axis
        (review finding: robust nonnegative-median repair)."""
        t = np.datetime64("2020-01-01", "ns") + np.arange(10) * np.timedelta64(2, "s")
        t[1] = t[0] - np.timedelta64(7, "s")
        t[2] = t[1] - np.timedelta64(2, "s")
        ds = Dataset(coords={"ping_time": t.copy()})
        ep.qc.coerce_increasing_time(ds, win_len=3)
        fixed = ds.coords["ping_time"].values
        assert not (np.diff(fixed) < np.timedelta64(0, "ns")).any()
        # fully reversed input also repairs (0-interval fallback)
        t2 = np.datetime64("2020-01-01", "ns") - np.arange(6) * np.timedelta64(1, "s")
        ds2 = Dataset(coords={"ping_time": t2.copy()})
        ep.qc.coerce_increasing_time(ds2, win_len=3)
        f2 = ds2.coords["ping_time"].values
        assert not (np.diff(f2) < np.timedelta64(0, "ns")).any()


class TestQCOrchestrate:
    def test_orchestrate_repairs_and_stores(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from synth_ek60 import write_ek60_raw
        import echopype_tpu as ep

        path = tmp_path / "Q-D20200101-T000000.raw"
        write_ek60_raw(path, n_pings=8, n_samples=20)
        ed = ep.open_raw(path, sonar_model="EK60")
        # corrupt one ping_time backwards
        beam = ed["Sonar/Beam_group1"]
        pt = beam.coords["ping_time"].values.copy()
        pt[4] = pt[3] - np.timedelta64(3, "s")
        from echopype_tpu.xrlite import DataArray

        beam.coords["ping_time"] = DataArray(pt, ("ping_time",), name="ping_time")
        assert ep.qc.exist_reversed_time(beam, "ping_time")
        ep.qc.orchestrate_reverse_time_check(ed)
        assert not ep.qc.exist_reversed_time(ed["Sonar/Beam_group1"], "ping_time")
        prov = ed["Provenance"]
        # reference naming: <group>_old_<time> (qc/api.py:152-155)
        assert "sonar_beam_group1_old_ping_time" in prov.data_vars
        assert prov.attrs["reversed_ping_times"] == 1
