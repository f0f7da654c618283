"""Experiment: matched-filter matmul variants on the chip.

Variant A = production `_mxu_conv_real` (shared-X einsum, [2,l,b,K]x[K,2T]).
Variant B = merged single matmul ([l,b,2K] x [2K,2T]) computing re/im
directly (half the intermediate output writes, no combine step).
Both at Precision.HIGHEST, T sweep {128, 256} for L=256.

Usage: PYTHONPATH=. python benchmarks/exp_bb_variants.py [cpu]
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

from echopype_tpu.ops.matched_filter import _mxu_conv_real


@partial(jax.jit, static_argnames=("out_start", "out_len", "T"))
def _mxu_conv_merged(xr, xi, hr, hi, out_start: int, out_len: int, T: int):
    precision = jax.lax.Precision.HIGHEST
    L = int(hr.shape[0])
    W = xr.shape[-1]
    lanes = xr.shape[0]
    hr_f, hi_f = hr[::-1], hi[::-1]
    K = T + L - 1
    nblk = -(-out_len // T)
    n_shift = -(-K // T)
    pad_left = L - 1 - out_start
    if pad_left < 0:
        xr, xi = xr[:, -pad_left:], xi[:, -pad_left:]
        W = W + pad_left
        pad_left = 0
    total = nblk * T + L - 1

    def expand(x):
        xp = jnp.pad(x, ((0, 0), (pad_left, max(0, total - pad_left - W))))[:, :total]
        xp2 = jnp.pad(xp, ((0, 0), (0, (nblk + n_shift) * T - total)))
        xb = xp2.reshape(lanes, nblk + n_shift, T)
        parts = [xb[:, s : s + nblk, :] for s in range(n_shift)]
        return jnp.concatenate(parts, axis=-1)[:, :, :K]

    def toep(hf):
        tp = jnp.arange(K)[:, None] - jnp.arange(T)[None, :]
        return jnp.where((tp >= 0) & (tp < L), hf[jnp.clip(tp, 0, L - 1)], 0.0)

    X = jnp.concatenate([expand(xr), expand(xi)], axis=-1)  # [l, nblk, 2K]
    Hr, Hi = toep(hr_f), toep(hi_f)
    Hc = jnp.concatenate(
        [jnp.concatenate([Hr, Hi], axis=-1), jnp.concatenate([-Hi, Hr], axis=-1)],
        axis=0,
    )  # [2K, 2T]
    Y = jnp.einsum("lbk,kt->lbt", X, Hc, precision=precision)
    re = Y[:, :, :T].reshape(lanes, nblk * T)[:, :out_len]
    im = Y[:, :, T:].reshape(lanes, nblk * T)[:, :out_len]
    return re, im


def measure(fn, args, n_iter, pings):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            salt = 1e-7 * (i.astype(jnp.float32) + acc * 1e-20)
            re, im = fn(a[0] + salt, *a[1:])
            return acc + jnp.sum(re[:, ::97]) + jnp.sum(im[:, ::97])

        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(*args))
    print(f"  compiled {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return pings / best, best * 1e3


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    B, L = 4, 256
    R = 4_096 if on_tpu else 512
    Pn = 512 if on_tpu else 16
    n_iter = 30 if on_tpu else 2
    rng = np.random.default_rng(2)
    lanes = Pn * B
    xr = rng.normal(0, 1e-3, (lanes, R)).astype("f4")
    xi = rng.normal(0, 1e-3, (lanes, R)).astype("f4")
    t = np.arange(L)
    h = (np.hanning(L) * np.exp(2j * np.pi * 0.1 * t)).astype("c8")
    hr = np.ascontiguousarray(np.flipud(np.conj(h)).real, dtype="f4")
    hi = np.ascontiguousarray(np.flipud(np.conj(h)).imag, dtype="f4")
    dev = jax.devices()[0]
    a = [jax.device_put(v, dev) for v in (xr, xi, hr, hi)]

    # accuracy cross-check (CPU semantics identical)
    raA = _mxu_conv_real(a[0], a[1], a[2], a[3], L - 1, R)
    for T in (128, 256):
        rb = _mxu_conv_merged(a[0], a[1], a[2], a[3], L - 1, R, T)
        d = max(
            float(jnp.max(jnp.abs(raA[0] - rb[0]))),
            float(jnp.max(jnp.abs(raA[1] - rb[1]))),
        )
        print(f"merged T={T}: max |delta| vs prod = {d:.3e}")

    results = {}
    fnA = partial(_mxu_conv_real, out_start=L - 1, out_len=R)
    rate, ms = measure(lambda xr, xi, hr, hi: fnA(xr, xi, hr, hi), a, n_iter, Pn)
    results["A_prod_T128"] = (rate, ms)
    print(f"A  production (T~L/2): {rate:,.0f} pings/s  {ms:.2f} ms/iter")
    for T in (128, 256):
        fnB = partial(_mxu_conv_merged, out_start=L - 1, out_len=R, T=T)
        rate, ms = measure(lambda xr, xi, hr, hi: fnB(xr, xi, hr, hi), a, n_iter, Pn)
        results[f"B_merged_T{T}"] = (rate, ms)
        print(f"B  merged   T={T}: {rate:,.0f} pings/s  {ms:.2f} ms/iter")


if __name__ == "__main__":
    main()
