"""Per-kernel chip throughput: NASC, clean masks, fused BB device program.

Round-4 (VERDICT item 6): every survey-streamer device program gets a
measured pings/s/chip rate, using the same methodology as the MVBS headline
in bench.py — n_iter steps chained inside ONE dispatch via fori_loop with a
data-dependent salt (remote-tunnel dispatch+readback adds ~28 ms/call on
this rig), checksum readback to force execution, best of n_reps.

Prints one JSON line per kernel.  Run on the real chip (default backend) or
CPU (small shapes) for development.
"""

import json
import sys
import time

import numpy as np


def _measure(chained, args_dev, n_iter, n_reps, pings_per_step):
    import jax

    print("compiling...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    float(chained(*args_dev))  # compile + warm
    print(f"compiled in {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        checksum = float(chained(*args_dev))
        best = min(best, (time.perf_counter() - t0) / n_iter)
        assert checksum == checksum or True
    return pings_per_step / best


def bench_nasc(on_tpu):
    """NASC device program: Sv bin partials + raw height sums per chunk
    (ops/binning.binned_window_partials + binned_window_sum_raw — the two
    kernels parallel/survey.run_survey_nasc runs per ping chunk)."""
    import jax
    import jax.numpy as jnp

    from echopype_tpu.ops import binning

    C, R = 5, 4000
    Pn = 8_192 if on_tpu else 512
    window, n_r = 8, 50
    rng = np.random.default_rng(0)
    sv = rng.normal(-70.0, 8.0, (C, Pn, R)).astype("f4")
    # uniform grids: production ships ONE [C, R] depth row per file and the
    # height sums collapse to a row matmul x per-bin ping counts (round-4
    # grid variants, ops/binning.py) — no [C, P, R] er/height operands
    er_row = np.broadcast_to(np.arange(R, dtype="f4") * 0.19, (C, R)).copy()
    h_row = np.full((C, R - 1), 0.19, dtype="f4")
    lo_row = np.ascontiguousarray(er_row[:, :-1])
    x_rel = np.minimum(np.arange(Pn) // max(1, Pn // window), window - 1).astype("i4")
    r_edges = np.linspace(0, 0.19 * R, n_r + 1).astype("f4")
    n_iter = 100 if on_tpu else 3

    def one(sv, er_row, h_row, lo_row, x_rel, r_edges, salt):
        # salt EVERY kernel input: a loop-invariant operand lets XLA's
        # while-loop invariant code motion hoist that kernel out of the
        # chained timing loop entirely (caught in round 4 — the height-sum
        # matmul was being amortized away)
        s, c, nanc = binning.binned_window_partials_grid(
            sv + salt, er_row, r_edges, x_rel, window
        )
        hs = binning.binned_window_row_sum(
            h_row + salt, lo_row, r_edges, x_rel, window
        )
        return jnp.nansum(s) + jnp.nansum(c) + jnp.nansum(nanc) + jnp.nansum(hs)

    @jax.jit
    def chained(sv, er_row, h_row, lo_row, x_rel, r_edges):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            return acc + one(sv, er_row, h_row, lo_row, x_rel, r_edges, salt)

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    dev = jax.devices()[0]
    args = [jax.device_put(a, dev) for a in (sv, er_row, h_row, lo_row, x_rel, r_edges)]
    rate = _measure(chained, args, n_iter, 3 if on_tpu else 1, Pn)
    return {
        "metric": "NASC device program (5ch x 4000 samples, Sv+height binning, grid variant)",
        "value": round(rate, 1),
        "unit": "pings/sec/chip",
    }


def bench_clean(on_tpu):
    """Clean-mask device kernels: transient (pooled-Sv comparison) and
    impulse (depth-binned two-sided ping comparison), the kernels
    clean.mask_transient_noise / mask_impulse_noise run on device
    (ops/windows.py)."""
    import jax
    import jax.numpy as jnp

    from echopype_tpu.ops.windows import (
        grid_window_members,
        impulse_mask_grid_device,
        transient_mask_grid_idx_device,
    )

    C, R = 1, 2000
    Pn = 4_096 if on_tpu else 256
    rng = np.random.default_rng(1)
    sv = rng.normal(-70.0, 8.0, (C, Pn, R)).astype("f4")
    # ping-invariant depth grid + bin-index grid, both [C, R]
    grid = np.broadcast_to(np.arange(R, dtype="f4") * 0.19, (C, R)).copy()
    n_bins = 64
    bin_idx = np.broadcast_to(
        np.minimum((np.arange(R) * n_bins) // R, n_bins - 1).astype("i4"), (C, R)
    ).copy()
    n_iter = 50 if on_tpu else 3

    # production path: f64-exact membership resolved on host once per
    # file, integer bounds feed the MXU kernel
    lo, hi, v_r, halo = grid_window_members(grid, 10.0, 5.0)
    gmask = np.isfinite(grid).astype("f4")

    def one(sv, grid, bin_idx, salt):
        t = transient_mask_grid_idx_device(
            sv + salt, gmask, lo, hi, v_r, 25,
            jnp.float32(12.0), range_halo=halo,
        )
        im = impulse_mask_grid_device(sv + salt, bin_idx, n_bins, 2, jnp.float32(10.0))
        return jnp.sum(t.astype(jnp.float32)) + jnp.sum(im.astype(jnp.float32))

    @jax.jit
    def chained(sv, grid, bin_idx):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            return acc + one(sv, grid, bin_idx, salt)

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    dev = jax.devices()[0]
    args = [jax.device_put(a, dev) for a in (sv, grid, bin_idx)]
    rate = _measure(chained, args, n_iter, 3 if on_tpu else 1, Pn)
    return {
        "metric": "clean masks device program (transient+impulse, 2000 samples)",
        "value": round(rate, 1),
        "unit": "pings/sec/chip",
    }


def bench_bb_fused(on_tpu):
    """Fused BB device program: pulse compression -> prx -> Sv -> binning in
    one program per channel chunk (ops/bb_pipeline.bb_chunk_window_partials
    — what run_survey_mvbs_from_raw(device_fused=True) dispatches)."""
    import jax
    import jax.numpy as jnp

    from echopype_tpu.ops.bb_pipeline import bb_chunk_window_partials

    B, L = 4, 256
    R = 4_096 if on_tpu else 512
    Pn = 512 if on_tpu else 16
    window, n_r = 4, 64
    rng = np.random.default_rng(2)
    bs_r = rng.normal(0, 1e-3, (Pn, R, B)).astype("f4")
    bs_i = rng.normal(0, 1e-3, (Pn, R, B)).astype("f4")
    t = np.arange(L)
    h = (np.hanning(L) * np.exp(2j * np.pi * 0.1 * t)).astype("c8")
    hr = np.ascontiguousarray(np.flipud(np.conj(h)).real, dtype="f4")
    hi = np.ascontiguousarray(np.flipud(np.conj(h)).imag, dtype="f4")
    z = np.full(Pn, 1.0, dtype="f4")
    dr = np.full(Pn, 0.19, dtype="f4")
    shift = np.full(Pn, 0.38, dtype="f4")
    alpha = np.full(Pn, 0.01, dtype="f4")
    off = np.full(Pn, -30.0, dtype="f4")
    k0 = np.full(Pn, 3, dtype="i4")
    vl = np.full(Pn, R, dtype="i4")
    x_rel = np.minimum(np.arange(Pn) // max(1, Pn // window), window - 1).astype("i4")
    r_edges = np.linspace(0, 0.19 * R, n_r + 1).astype("f4")
    n_iter = 30 if on_tpu else 2

    def one(bs_r, bs_i, off, salt):
        # the salt MUST enter the complex samples, not just the Sv offset:
        # pulse compression depends only on bs_r/bs_i, and with those
        # loop-invariant XLA hoists the ENTIRE matched filter out of the
        # fori_loop (caught in round 4 — the published 536k pings/s rate was
        # measuring an amortized-away PC)
        s, c = bb_chunk_window_partials(
            bs_r + salt, bs_i, hr, hi, np.float32(1.0), z, dr, shift, alpha,
            off, k0, vl, x_rel, r_edges, window, True, uniform_er=True,
        )
        return jnp.nansum(s) + jnp.nansum(c)

    @jax.jit
    def chained(bs_r, bs_i, off):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            return acc + one(bs_r, bs_i, off, salt)

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    dev = jax.devices()[0]
    args = [jax.device_put(a, dev) for a in (bs_r, bs_i, off)]
    rate = _measure(chained, args, n_iter, 3 if on_tpu else 1, Pn)
    return {
        "metric": (
            f"fused BB device program (PC L={L} + Sv + binning, "
            f"{R} samples x {B} sectors, 1ch)"
        ),
        "value": round(rate, 1),
        "unit": "pings/sec/chip",
    }


def main():
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    for fn in (bench_nasc, bench_clean, bench_bb_fused):
        row = fn(on_tpu)
        row["backend"] = jax.devices()[0].platform
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    sys.exit(main())
