"""Measure the numerical error budget of every calibration path.

Reference truth = the reference implementation itself, executed on our
converted groups through the xrlite xarray facade (tests/ref_oracle.py) in
float64.  Prints a markdown table of |delta Sv| percentiles for:

  - EK60 power Sv, float64 chunked path (default) and float32 device path
  - EK80 CW-complex Sv, both paths
  - EK80 BB Sv, both paths
  - MVBS on the f32-binned device path vs f64 numpy binning of reference Sv

Run on the deterministic CPU backend:
    python benchmarks/error_budget.py
"""

import pathlib
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import echopype_tpu as ep  # noqa: E402
from ref_oracle import FakeEchoData, load_ref  # noqa: E402
from synth_ek60 import write_ek60_raw  # noqa: E402
from synth_ek80 import write_ek80_raw  # noqa: E402


def _fake(ed):
    groups = {}
    for p in (
        "Sonar",
        "Environment",
        "Vendor_specific",
        "Sonar/Beam_group1",
        "Sonar/Beam_group2",
        "Sonar/Beam_group3",
    ):
        try:
            groups[p] = ed[p]
        except KeyError:
            pass
    return FakeEchoData(groups, ed.sonar_model)


def _delta_stats(ref, ours):
    rv = np.asarray(ref, dtype="f8").ravel()
    ov = np.asarray(ours, dtype="f8").ravel()
    both = np.isfinite(rv) & np.isfinite(ov)
    mismatch = (np.isnan(rv) != np.isnan(ov)).mean()
    d = np.abs(rv[both] - ov[both])
    return {
        "p50": float(np.percentile(d, 50)),
        "p99": float(np.percentile(d, 99)),
        "max": float(d.max()),
        "nan_mismatch_frac": float(mismatch),
    }


def _fmt(name, st):
    return (
        f"| {name} | {st['p50']:.2e} | {st['p99']:.2e} | {st['max']:.2e} "
        f"| {st['nan_mismatch_frac']:.4f} |"
    )


def main():
    tmp = pathlib.Path(tempfile.mkdtemp())
    rows = []

    # ---------------- EK60 power ----------------
    p60 = tmp / "EB60-D20200101-T000000.raw"
    write_ek60_raw(p60, n_pings=256, n_samples=1024)
    ed60 = ep.open_raw(p60, sonar_model="EK60")
    ref_ek = load_ref("calibrate/calibrate_ek")
    ref_sv60 = (
        ref_ek.CalibrateEK60(_fake(ed60), None, None, None)
        .compute_Sv()["Sv"]
        .transpose("channel", "ping_time", "range_sample")
        .values
    )
    sv64 = ep.calibrate.compute_Sv(ed60, precision="float64")["Sv"].values
    sv32 = ep.calibrate.compute_Sv(ed60, precision="float32")["Sv"].values
    rows.append(_fmt("EK60 power Sv, float32 device (default)", _delta_stats(ref_sv60, sv32)))
    rows.append(_fmt("EK60 power Sv, float64 opt-in", _delta_stats(ref_sv60, sv64)))

    # ---------------- EK80 CW complex + BB ----------------
    p80 = tmp / "EB80-D20210201-T000000.raw"
    write_ek80_raw(p80, n_pings=64, n_samples=512)
    ed80 = ep.open_raw(p80, sonar_model="EK80")

    for wm, em, label in (
        ("CW", "complex", "EK80 CW-complex Sv"),
        ("BB", "complex", "EK80 BB Sv"),
        ("CW", "power", "EK80 CW-power Sv"),
    ):
        ref_cal = ref_ek.CalibrateEK80(
            _fake(ed80), env_params=None, cal_params=None,
            waveform_mode=wm, encode_mode=em,
        )
        ref_sv = (
            ref_cal.compute_Sv()["Sv"]
            .transpose("channel", "ping_time", "range_sample")
            .values
        )
        o64 = ep.calibrate.compute_Sv(
            ed80, waveform_mode=wm, encode_mode=em, precision="float64"
        )["Sv"].values
        o32 = ep.calibrate.compute_Sv(
            ed80, waveform_mode=wm, encode_mode=em, precision="float32"
        )["Sv"].values
        rows.append(_fmt(f"{label}, float32 device (default)", _delta_stats(ref_sv, o32)))
        rows.append(_fmt(f"{label}, float64 opt-in", _delta_stats(ref_sv, o64)))

        if wm == "BB":
            # isolate the residual: quantize OUR pulse-compression output to
            # complex64 exactly like the reference (_convolve_per_channel
            # allocates np.complex64) -> difference collapses to f64 eps,
            # proving the f64-path residual above is the reference's own
            # rounding, not ours
            import echopype_tpu.calibrate.ek80 as our_ek80

            orig = our_ek80.compress_pulse

            def _quantized(backscatter, chirp, precision="float64"):
                pc = orig(backscatter, chirp, precision=precision)
                pc.values = pc.values.astype("complex64").astype("complex128")
                return pc

            our_ek80.compress_pulse = _quantized
            try:
                oq = ep.calibrate.compute_Sv(
                    ed80, waveform_mode=wm, encode_mode=em, precision="float64"
                )["Sv"].values
            finally:
                our_ek80.compress_pulse = orig
            rows.append(
                _fmt("EK80 BB Sv, float64 + ref's c64 pc quantization", _delta_stats(ref_sv, oq))
            )

    # ---------------- AZFP power ----------------
    from synth_azfp import write_azfp_raw, write_azfp_xml

    pazfp = tmp / "23010100.01A"
    xazfp = tmp / "azfp_cfg.xml"
    write_azfp_raw(pazfp, n_pings=48)
    write_azfp_xml(xazfp)
    edaz = ep.open_raw(pazfp, sonar_model="AZFP", xml_path=str(xazfp))
    ref_az = load_ref("calibrate/calibrate_azfp")
    env_az = {"salinity": 29.6, "pressure": 60.0, "temperature": 9.2}
    fake_az = FakeEchoData(
        {p: edaz[p] for p in ("Sonar/Beam_group1", "Environment", "Vendor_specific")},
        edaz.sonar_model,
    )
    ref_svaz = (
        ref_az.CalibrateAZFP(fake_az, env_params=dict(env_az))
        .compute_Sv()["Sv"]
        .transpose("channel", "ping_time", "range_sample")
        .values
    )
    oaz = ep.calibrate.compute_Sv(
        edaz, env_params=dict(env_az), precision="float64"
    )["Sv"].values
    rows.append(_fmt("AZFP power Sv, float64", _delta_stats(ref_svaz, oaz)))

    # ---------------- MVBS: f32 device binning vs f64 numpy binning ----------
    ds64 = ep.calibrate.compute_Sv(ed60, precision="float64")
    mv_dev = ep.commongrid.compute_MVBS(ds64, range_bin="20m", ping_time_bin="4s")
    # f64 numpy oracle binning of the same (reference-parity) Sv
    sv = np.asarray(ds64["Sv"].values, dtype="f8")
    er = np.asarray(ds64["echo_range"].values, dtype="f8")
    pt = np.asarray(ds64.coords["ping_time"].values)
    # epoch-aligned 4 s bins (pandas-resample semantics, like the reference)
    t0 = ((pt[0].astype("i8") // 4_000_000_000) * 4_000_000_000).astype("datetime64[ns]")
    pbin = ((pt - t0) // np.timedelta64(4, "s")).astype(int)
    n_p = pbin.max() + 1
    n_r = int(np.ceil(np.nanmax(er) / 20.0))
    out = np.full((sv.shape[0], n_p, n_r), np.nan)
    for c in range(sv.shape[0]):
        for b in range(n_p):
            cols = pbin == b
            for r in range(n_r):
                cell = (er[c, cols] >= r * 20.0) & (er[c, cols] < (r + 1) * 20.0)
                vals = sv[c, cols][cell]
                vals = vals[np.isfinite(vals)]
                if len(vals):
                    out[c, b, r] = 10 * np.log10(np.mean(10 ** (vals / 10)))
    mv = mv_dev["Sv"].transpose("channel", "ping_time", "echo_range").values
    nb = min(mv.shape[1], n_p)
    nr = min(mv.shape[2], n_r)
    rows.append(
        _fmt("MVBS 20m x 4s, device binning", _delta_stats(out[:, :nb, :nr], mv[:, :nb, :nr]))
    )

    print("| path | p50 dB | p99 dB | max dB | NaN-mask mismatch |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
