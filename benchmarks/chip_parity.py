"""On-chip numerical parity guard for the fused survey device programs.

The pytest suite runs on the CPU backend (tests/conftest.py), where XLA
matmuls are exact f32 — it can NEVER see a TPU-only precision regression.
Round 4 found exactly one: the binning matmuls ran at the MXU's DEFAULT
(single-bf16-pass) precision, quantizing on-chip bin sums to ~1e-3 dB while
every CPU differential stayed green.  This script re-runs the core
fused-vs-composed comparisons ON THE REAL CHIP and exits nonzero if any
budget is exceeded.  Run it after touching ops/ or parallel/ kernels:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/chip_parity.py

Budgets are the soak's measured bounds (soak_differentials.soak_survey):
fused raw->MVBS <=3e-5 dB vs the composed f32 chain (fused one-shot pre-exp
rounding <=2e-5 dB from f64 truth, composed <=5e-6), masked legs <=5e-5 dB,
NaN masks exact.  On the CPU backend the same script passes trivially; the
point is the TPU run.
"""

import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _check(tag, got, want, atol, fails, var="Sv"):
    g = np.asarray(got[var].values, dtype="f8")
    w = np.asarray(want[var].values, dtype="f8")
    if g.shape != w.shape:
        fails.append(f"{tag}: shape {g.shape} vs {w.shape}")
        return
    if not np.array_equal(np.isnan(g), np.isnan(w)):
        n = int(np.sum(np.isnan(g) != np.isnan(w)))
        fails.append(f"{tag}: NaN-mask mismatch on {n} cells")
        return
    d = np.abs(np.where(np.isnan(g), 0.0, g - w)).max()
    status = "ok" if d <= atol else f"FAIL (budget {atol:g})"
    print(f"{tag:34s} max|d| = {d:.3e} dB  {status}", flush=True)
    if d > atol:
        fails.append(f"{tag}: {d:.3e} > {atol:g}")


def main():
    import jax

    import echopype_tpu as ep
    from echopype_tpu.parallel import run_survey_mvbs, run_survey_mvbs_from_raw
    from synth_ek60 import write_ek60_raw

    print("backend:", jax.default_backend(), flush=True)
    tmp = pathlib.Path(tempfile.mkdtemp())
    t0 = np.datetime64("2020-01-01T00:00:00", "ns")
    files = []
    for k in range(2):
        raw = tmp / f"CP{k}-D20200101-T000000.raw"
        kw = {"ragged": True} if k == 0 else {"skip_pings": {1: {1, 6, 12}}}
        write_ek60_raw(raw, n_pings=36, n_samples=400, seed=11 + k,
                       t0=t0 + np.timedelta64(k * 41, "s"), **kw)
        files.append(str(raw))
    kw = dict(range_bin_m=7.3, ping_time_bin="10s", chunk_pings=9)
    sv32 = [ep.calibrate.compute_Sv(ep.open_raw(f, sonar_model="EK60"),
                                    precision="float32") for f in files]
    want = run_survey_mvbs(sv32, **kw)

    fails = []
    for tag, extra in [("mvbs plain (eager)", dict(prefetch=False)),
                       ("mvbs plain (prefetch)", dict(prefetch=True))]:
        got = run_survey_mvbs_from_raw(files, sonar_model="EK60", **extra, **kw)
        _check(tag, got, want, 3e-5, fails)

    chans = [str(c) for c in sv32[0].coords["channel"].values]
    eq = f'"{chans[0]}" - "{chans[1]}" >= 2.5dB'
    gotf = run_survey_mvbs_from_raw(files, sonar_model="EK60", freq_diff=eq, **kw)
    masked = [ep.mask.apply_mask(d, ep.mask.frequency_differencing(d, chanABEq=eq))
              for d in sv32]
    _check("mvbs fused freq_diff", gotf, run_survey_mvbs(masked, **kw), 5e-5, fails)

    spec = {"impulse": dict(depth_bin="4.0m", num_side_pings=2,
                            impulse_noise_threshold="9.0dB",
                            range_var="echo_range")}
    gotn = run_survey_mvbs_from_raw(files, sonar_model="EK60",
                                    noise_masks=spec, **kw)
    from test_survey_clean import _masked_copy

    wantn = run_survey_mvbs([_masked_copy(d, spec) for d in sv32], **kw)
    _check("mvbs fused impulse mask", gotn, wantn, 5e-5, fails)

    # NASC grid kernels (binned_window_partials_grid + row sums) on chip
    from echopype_tpu.parallel.survey import run_survey_nasc
    from test_ref_commongrid import make_nasc_ds

    nds = []
    for k in range(2):
        d = make_nasc_ds(n_ch=2, n_ping=30, n_r=80, seed=5 + k)
        pt = np.asarray(d.coords["ping_time"].values) + np.timedelta64(k * 35, "s")
        d.coords["ping_time"].values = pt
        nds.append(d)
    nkw = dict(range_bin="4.1m", dist_bin="0.03nmi", chunk_pings=11)
    got1 = run_survey_nasc(nds, **nkw)
    got2 = run_survey_nasc(nds, **dict(nkw, chunk_pings=7))
    # grouping/counts are chunk-exact; SUMS are f32 per-chunk partials, so
    # different chunkings reassociate ~10^3-sample bins (measured 4.4e-5 dB
    # on CPU and TPU alike — plain f32 accumulation, not a kernel defect)
    _check("nasc chunking invariance", got1, got2, 1e-4, fails, var="NASC")

    if fails:
        print("CHIP PARITY FAILURES:")
        for f in fails:
            print(" -", f)
        return 1
    print("CHIP PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
