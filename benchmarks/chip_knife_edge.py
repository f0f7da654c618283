"""On-chip knife-edge parity: counts from the refined closed-form bounds/k0
must EXACTLY match direct f32-grid membership when shift and bin edges are
exactly-integral multiples of dr (the reciprocal-division failure class that
CPU tests cannot catch).

Run on the real chip: PYTHONPATH=. python benchmarks/chip_knife_edge.py
Measured 2026-08-16 (v5e): both kernels 0 count mismatches, 1.03e-3 max
relative linear-domain sum spread vs the float64 host oracle (~0.004 dB,
the f32 exp/log envelope)."""
import numpy as np
import jax
import jax.numpy as jnp

from echopype_tpu.parallel.pipeline import (
    sv_mvbs_window_partials,
    sv_mvbs_window_partials_uniform,
)

INDEX2POWER = np.float32(10.0 * np.log10(2.0) / 256.0)

rng = np.random.default_rng(3)
C, P, R = 3, 512, 512
n_x, n_r = 4, 8

dr0 = np.array([0.19, 0.25, 0.1875], dtype=np.float32)   # last two dyadic-exact
k_shift = np.array([2, 7, 13], dtype=np.int64)
sh0 = (k_shift.astype(np.float64) * dr0.astype(np.float64)).astype(np.float32)

dr = np.repeat(dr0[:, None], P, axis=1)
shift = np.repeat(sh0[:, None], P, axis=1)
ab = np.full((C, P), 0.01, np.float32)
off = rng.normal(-30, 2, (C, P)).astype(np.float32)
vl = rng.integers(R // 2, R + 1, (C, P)).astype(np.int32)
power = rng.integers(-12000, -2000, (C, P, R), dtype=np.int16)
x_rel = np.sort(rng.integers(0, n_x, P)).astype(np.int32)
# edges at exact multiples of dr of channel 0 (knife edge for that channel;
# off-grid for the others) plus one exactly-0 edge
edge_k = np.array([0, 16, 40, 80, 130, 200, 300, 400, 480], dtype=np.float64)
r_edges = (edge_k * float(dr0[0])).astype(np.float32)

def host_ref():
    k = np.arange(R, dtype=np.float32)
    r = (k[None, :] * dr0[:, None]).astype(np.float32)      # [C,R] f32 grid
    valid = (r > sh0[:, None])[:, None, :] & (k[None, None, :] < vl[:, :, None])
    r_tvg = (r - sh0[:, None]).astype(np.float32)[:, None, :]
    p_db = power.astype(np.float32) * INDEX2POWER
    sv = p_db + np.float32(20) * np.log10(np.where(valid, r_tvg, 1)) \
         + np.float32(2) * ab[:, :, None] * r_tvg + off[:, :, None]
    lin = np.where(valid, 10.0 ** (sv.astype(np.float64) / 10.0), 0.0)
    sums = np.zeros((C, n_x, n_r)); counts = np.zeros((C, n_x, n_r))
    for b in range(n_r):
        m = valid & (r >= r_edges[b])[:, None, :] & (r < r_edges[b + 1])[:, None, :]
        for x in range(n_x):
            sel = x_rel == x
            sums[:, x, b] = (lin * m)[:, sel, :].sum(axis=(1, 2))
            counts[:, x, b] = m[:, sel, :].sum(axis=(1, 2))
    return sums, counts

hs, hc = host_ref()

dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)
args = [jax.device_put(a, dev) for a in (power, dr, shift, ab, off, vl, x_rel)]
re_d = jax.device_put(r_edges, dev)

s_g, c_g = sv_mvbs_window_partials(*args[:6], args[6], re_d, n_x, n_r)
s_u, c_u = sv_mvbs_window_partials_uniform(*args[:6], args[6], re_d, n_x, n_r)
for name, s, c in (("general", s_g, c_g), ("uniform", s_u, c_u)):
    s = np.asarray(s, dtype=np.float64); c = np.asarray(c, dtype=np.float64)
    dc = np.abs(c - hc).max()
    rs = np.abs(s - hs) / np.maximum(np.abs(hs), 1e-30)
    print(f"{name}: max count mismatch {dc}, max rel sum err {rs.max():.3e}", flush=True)
    assert dc == 0.0, f"{name} counts off by {dc} (knife edge!)"
    assert rs.max() < 5e-3, f"{name} sums off"
print("ON-CHIP KNIFE-EDGE PARITY OK")
