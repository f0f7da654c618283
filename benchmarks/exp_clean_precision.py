"""Experiment: precision split for the clean-mask pooling matmuls.

Counts are 0/1 inputs against a 0/1 band — exact in ONE bf16 pass with f32
accumulation; the lin sums tolerate HIGH (3-pass, ~1e-7 relative).  Current
production runs everything at HIGHEST (6-pass).  Measures the fused
transient+impulse program and reports mask agreement vs production.

Usage: PYTHONPATH=. python benchmarks/exp_clean_precision.py [cpu]
"""

import sys
import time
from functools import partial

import numpy as np

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from echopype_tpu.ops import windows as W
from echopype_tpu.ops.windows import (
    _expand_tiles,
    _pool_validity_grid,
    grid_window_halo,
)


def _pool_windows_grid_split(sv, grid, depth_bin, num_side_pings, range_halo,
                             lin_prec, cnt_prec, tile=128):
    C, P, R = sv.shape
    lin = jnp.power(10.0, sv / 10.0)
    lin_f = jnp.where(jnp.isnan(sv), 0.0, lin)
    cnt = (~jnp.isnan(sv)).astype(jnp.float32)
    d = grid
    H = int(range_halo)
    T = min(tile, R)
    gb = _expand_tiles(d, H, T, pad_value=jnp.inf)
    nT = gb.shape[-2]
    gc = jnp.pad(d, ((0, 0), (0, nT * T - R)), constant_values=jnp.inf).reshape(C, nT, T)
    band = (
        (gb[..., :, None] >= gc[..., None, :] - depth_bin)
        & (gb[..., :, None] <= gc[..., None, :] + depth_bin)
    ).astype(jnp.float32)

    def range_pass(x, prec):
        xb = _expand_tiles(x, H, T)
        y = jnp.einsum("cpnk,cnkt->cpnt", xb, band, precision=prec,
                       preferred_element_type=jnp.float32)
        return y.reshape(C, P, nT * T)[..., :R]

    s1 = range_pass(lin_f, lin_prec)
    n1 = range_pass(cnt, cnt_prec)

    def ping_pass(x, prec):
        x = jnp.moveaxis(x, 1, 2)  # [C, R, P]
        Pn = x.shape[-1]
        Tp = min(tile, max(1, Pn))
        K = Tp + 2 * num_side_pings
        xb = _expand_tiles(x, num_side_pings, Tp)
        k = jnp.arange(K)[:, None]
        t = jnp.arange(Tp)[None, :]
        bandp = ((k >= t) & (k <= t + 2 * num_side_pings)).astype(jnp.float32)
        y = jnp.einsum("crnk,kt->crnt", xb, bandp, precision=prec,
                       preferred_element_type=jnp.float32)
        nTp = xb.shape[-2]
        return jnp.moveaxis(y.reshape(C, x.shape[1], nTp * Tp)[..., :Pn], 1, 2)

    sw = ping_pass(s1, lin_prec)
    nw = ping_pass(n1, cnt_prec)
    return sw, nw


@partial(jax.jit, static_argnames=("num_side_pings", "range_halo", "lp", "cp"))
def transient_split(sv, grid, depth_bin, num_side_pings, exclude_above, threshold,
                    range_halo, lp, cp):
    C, P, R = sv.shape
    sw, nw = _pool_windows_grid_split(sv, grid, depth_bin, num_side_pings,
                                      range_halo, lp, cp)
    pooled = jnp.where(nw > 0, 10.0 * jnp.log10(sw / jnp.maximum(nw, 1.0)), jnp.nan)
    valid = _pool_validity_grid(grid, depth_bin, num_side_pings, exclude_above, P)
    return (sv - jnp.where(valid, pooled, jnp.nan)) > threshold


def measure(fn, args, n_iter):
    @jax.jit
    def chained(sv, *rest):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            m = fn(sv + salt, *rest)
            return acc + jnp.sum(m.astype(jnp.float32))

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(*args))
    print(f"  compiled {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    C, R = 1, 2000
    Pn = 4096 if on_tpu else 256
    rng = np.random.default_rng(1)
    sv = rng.normal(-70.0, 8.0, (C, Pn, R)).astype("f4")
    grid = np.broadcast_to(np.arange(R, dtype="f4") * 0.19, (C, R)).copy()
    halo = grid_window_halo(grid, 10.0)
    n_iter = 50 if on_tpu else 2
    dev = jax.devices()[0]
    a = [jax.device_put(x, dev) for x in (sv, grid)]
    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH
    DF = jax.lax.Precision.DEFAULT

    base = W.transient_mask_grid_device(a[0], a[1], jnp.float32(10.0), 25,
                                        jnp.float32(5.0), jnp.float32(12.0),
                                        range_halo=halo)
    for name, lp, cp in (("HIGHEST/HIGHEST", HI, HI), ("HIGH/DEFAULT", H3, DF),
                         ("HIGHEST/DEFAULT", HI, DF)):
        m = transient_split(a[0], a[1], jnp.float32(10.0), 25, jnp.float32(5.0),
                            jnp.float32(12.0), halo, lp, cp)
        flips = int(jnp.sum(m != base))
        t = measure(
            lambda s, g, lp=lp, cp=cp: transient_split(
                s, g, jnp.float32(10.0), 25, jnp.float32(5.0), jnp.float32(12.0),
                halo, lp, cp),
            a, n_iter)
        print(f"{name:18s}: {Pn/t:10,.0f} pings/s  {t*1e3:6.2f} ms/iter  "
              f"mask flips vs prod: {flips}/{sv.size}")


if __name__ == "__main__":
    main()
