"""Fused-BB kernel roofline decomposition + Toeplitz block (T) sweep.

Round-5 VERDICT item 2: the fused BB device program measured ~35% of the
f32-HIGHEST envelope with a structural (T+L-1)/L MAC overhead in the
blocked-Toeplitz matched filter.  This script measures, on the real chip:

  1. the X6 (HIGHEST) matmul envelope at a large square shape,
  2. the matched-filter dot IN ISOLATION at the fused-bench shape for a
     sweep of Toeplitz block sizes T (overhead (T+L-1)/L trades against
     MXU lane width N=2T),
  3. the FULL fused program (PC -> prx -> Sv -> binning) at the same T
     sweep — what run_survey_mvbs_from_raw(device_fused=True) dispatches,

at the chip bench shape (1 channel, 512 pings x 4096 samples x 4 sectors,
L=256 replica — benchmarks/chip_kernels_bench.py:bench_bb_fused).  Output:
one JSON line per measurement.  Conclusions land in docs/PERFORMANCE.md.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_bb_roofline.py
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _measure_ms(chained, args, n_iter, n_reps=3):
    """Scalar float() readback forces completion — block_until_ready is not
    a reliable sync on the experimental axon platform (the established
    methodology of chip_kernels_bench._measure)."""
    float(np.asarray(chained(*args)).ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(n_reps):
        t0 = time.perf_counter()
        checksum = float(np.asarray(chained(*args)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n_iter)
        assert checksum == checksum or True
    return best * 1e3


def envelope(n=4096, n_iter=8):
    """X6 (HIGHEST) and DEFAULT square-matmul rates."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = jax.device_put(rng.normal(size=(n, n)).astype("f4"))
    b = jax.device_put(rng.normal(size=(n, n)).astype("f4"))
    out = {}
    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)):
        @jax.jit
        def chained(a, b, prec=prec):
            def body(i, acc):
                return jnp.dot(acc * (1.0 + 1e-12), b, precision=prec)

            out = jax.lax.fori_loop(0, n_iter, body, a)
            return jnp.sum(out[::173, ::211])

        ms = _measure_ms(chained, (a, b), n_iter)
        tf = 2 * n**3 / (ms * 1e-3) / 1e12
        out[name] = tf
        print(json.dumps({"metric": f"square {n} matmul {name}", "tflops": round(tf, 2)}))
    return out


BENCH = dict(B=4, L=256, R=4096, Pn=512, window=4, n_r=64)


def _bench_inputs():
    rng = np.random.default_rng(2)
    B, L, R, Pn = BENCH["B"], BENCH["L"], BENCH["R"], BENCH["Pn"]
    bs_r = rng.normal(0, 1e-3, (Pn, R, B)).astype("f4")
    bs_i = rng.normal(0, 1e-3, (Pn, R, B)).astype("f4")
    t = np.arange(L)
    h = (np.hanning(L) * np.exp(2j * np.pi * 0.1 * t)).astype("c8")
    hr = np.ascontiguousarray(np.flipud(np.conj(h)).real, dtype="f4")
    hi = np.ascontiguousarray(np.flipud(np.conj(h)).imag, dtype="f4")
    return bs_r, bs_i, hr, hi


def conv_only(T_list, n_iter=20):
    """Matched-filter dot in isolation (lanes = Pn*B)."""
    import jax
    import jax.numpy as jnp

    from echopype_tpu.ops.matched_filter import _mxu_conv_real

    bs_r, bs_i, hr, hi = _bench_inputs()
    B, L, R, Pn = BENCH["B"], BENCH["L"], BENCH["R"], BENCH["Pn"]
    lanes_r = np.moveaxis(bs_r, 2, 1).reshape(Pn * B, R)
    lanes_i = np.moveaxis(bs_i, 2, 1).reshape(Pn * B, R)
    dev_r = jax.device_put(lanes_r)
    dev_i = jax.device_put(lanes_i)
    hr_d, hi_d = jax.device_put(hr), jax.device_put(hi)
    rates = {}
    for T in T_list:
        @jax.jit
        def chained(xr, xi, hr, hi, T=T):
            def body(i, acc):
                salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
                re, im = _mxu_conv_real(
                    xr + salt, xi, hr, hi, L - 1, R,
                    precision=jax.lax.Precision.HIGHEST, block_t=T,
                )
                return acc + jnp.sum(re[::97, ::53]) + jnp.sum(im[::89, ::61])

            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

        ms = _measure_ms(chained, (dev_r, dev_i, hr_d, hi_d), n_iter)
        Teff = T or 128
        K = Teff + L - 1
        nblk = -(-R // Teff)
        macs = (Pn * B) * nblk * (2 * K) * (2 * Teff)
        rate = Pn / (ms * 1e-3)
        rates[Teff] = rate
        print(json.dumps({
            "metric": f"PC-only L={L} T={Teff}", "ms": round(ms, 3),
            "pings_per_sec": round(rate, 1),
            "mac_overhead": round(K / L, 3),
            "x6_tflops": round(2 * macs / (ms * 1e-3) / 1e12, 2),
        }))
    return rates


def fused(T_list, n_iter=20):
    """Full fused program (PC + prx + Sv + binning) at the bench shape."""
    import jax
    import jax.numpy as jnp

    from echopype_tpu.ops.bb_pipeline import bb_chunk_window_partials

    bs_r, bs_i, hr, hi = _bench_inputs()
    B, L, R, Pn = BENCH["B"], BENCH["L"], BENCH["R"], BENCH["Pn"]
    window, n_r = BENCH["window"], BENCH["n_r"]
    z = np.full(Pn, 1.0, dtype="f4")
    dr = np.full(Pn, 0.19, dtype="f4")
    shift = np.full(Pn, 0.38, dtype="f4")
    alpha = np.full(Pn, 0.01, dtype="f4")
    off = np.full(Pn, -30.0, dtype="f4")
    k0 = np.full(Pn, 3, dtype="i4")
    vl = np.full(Pn, R, dtype="i4")
    x_rel = np.minimum(np.arange(Pn) // max(1, Pn // window), window - 1).astype("i4")
    r_edges = np.linspace(0, 0.19 * R, n_r + 1).astype("f4")
    dev = jax.devices()[0]
    a_r, a_i, a_off = (jax.device_put(a, dev) for a in (bs_r, bs_i, off))
    best = (None, 0.0)
    for T in T_list:
        def one(bs_r, bs_i, off, salt, T=T):
            s, c = bb_chunk_window_partials(
                bs_r + salt, bs_i, hr, hi, np.float32(1.0), z, dr, shift, alpha,
                off, k0, vl, x_rel, r_edges, window, True, uniform_er=True,
                block_t=T,
            )
            return jnp.nansum(s) + jnp.nansum(c)

        @jax.jit
        def chained(bs_r, bs_i, off, T=T):
            def body(i, acc):
                salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
                return acc + one(bs_r, bs_i, off, salt)

            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

        ms = _measure_ms(chained, (a_r, a_i, a_off), n_iter)
        rate = Pn / (ms * 1e-3)
        if rate > best[1]:
            best = (T or 128, rate)
        print(json.dumps({
            "metric": f"fused BB T={T or 128}", "ms": round(ms, 3),
            "pings_per_sec": round(rate, 1),
        }))
    print(json.dumps({"metric": "fused BB best", "T": best[0],
                      "pings_per_sec": round(best[1], 1)}))


def main():
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        print(json.dumps({"note": "CPU backend; rates not meaningful"}))
    envelope()
    conv_only([128, 256, 384, 512])
    fused([0, 128, 256, 384, 512])


if __name__ == "__main__":
    main()
