"""Pallas TPU kernel: fully fused survey step — calibration, linear-domain
conversion, range binning, and ping-window binning in ONE pass over VMEM
tiles.

The XLA window kernel (parallel/pipeline.sv_mvbs_window_partials) materializes
the [C, P, R] linear-domain intermediate in HBM between the elementwise chain
and the bin matmul — at the bench workload that is ~3.2 GB of extra traffic
per iteration, most of its runtime.  Here each power tile is read once
(int16, half the bytes), calibrated in VMEM, contracted against the banded
range matrix on the MXU, and the per-ping partials immediately contract
against the ping-window one-hot — only the [C, W, n_r] accumulators ever
leave the core.  HBM traffic = one int16 read of power: the bandwidth floor.

The round-1 Pallas lesson (per-grid-step overhead dominating at small tiles)
is addressed with large ping tiles (default 512; VMEM ~22 MB/step) and by
keeping every output tiny.

MEASURED OUTCOME (v5e, bench workload): 4.86 ms/iter at tile 512, 4.76 ms at
tile 1024 — parity with the XLA window kernel (4.75 ms), because the op is
TRANSCENDENTAL-bound, not HBM-bound: eliminating the linear-domain
materialization buys nothing while the per-element exp/log dominate.  The
winning move was algorithmic instead: hoisting the spreading log to one
[C, R] row (parallel/pipeline.sv_mvbs_window_partials_uniform, 3.81 ms).
This kernel is retained as the documented negative result with an
interpret-mode parity test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_partials_pallas", "window_partials_pallas_uniform"]

_LN10_OVER_10 = 0.23025850929940458
_INDEX2POWER = 0.011758984205624481  # 10*log10(2)/256


def _body(power_ref, dr_ref, tvg_ref, ab_ref, off_ref, k0_ref, vl_ref,
          xrel_ref, bounds_ref, out_ref):
    pt = pl.program_id(1)
    TP, R = power_ref.shape[1], power_ref.shape[2]
    W = out_ref.shape[1]
    n_edges = bounds_ref.shape[2]

    power = power_ref[0].astype(jnp.float32)
    if jnp.issubdtype(power_ref.dtype, jnp.integer):
        power = power * jnp.float32(_INDEX2POWER)
    dr = dr_ref[0]  # [TP, 1]
    k = jax.lax.broadcasted_iota(jnp.int32, (TP, R), 1).astype(jnp.float32)
    r_tvg = k * dr - tvg_ref[0]
    k0 = k0_ref[0]  # [TP, 1] f32
    vl = vl_ref[0]  # [TP, 1] f32
    valid = (k >= k0) & (k < vl)
    sv = (
        power
        + 20.0 * jnp.log10(jnp.maximum(r_tvg, jnp.float32(1e-20)))
        + 2.0 * ab_ref[0] * r_tvg
        + off_ref[0]
    )
    lin = jnp.where(valid, jnp.exp(sv * jnp.float32(_LN10_OVER_10)), 0.0)

    # banded range matrix from per-channel closed-form bounds (host-derived
    # in float64 — in-kernel division is reciprocal-lowered on Mosaic and
    # shifts integral edges by one sample)
    bounds = bounds_ref[0]  # [1, n_edges] f32 (row vector)
    # Mosaic iota must be integer-typed
    r_col = jax.lax.broadcasted_iota(jnp.int32, (R, n_edges - 1), 0).astype(jnp.float32)
    M = ((r_col >= bounds[0, :-1][None, :]) & (r_col < bounds[0, 1:][None, :])).astype(
        jnp.float32
    )
    s1 = jnp.dot(lin, M, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [TP, n_r]

    # closed-form counts: overlap of [k0, vl) with each bin's sample bounds
    clipped = jnp.clip(bounds, k0, vl)  # [TP, n_edges]
    n1 = clipped[:, 1:] - clipped[:, :-1]  # [TP, n_r]

    # ping-window one-hot (parked ids >= W match no column)
    xrel = xrel_ref[...]  # [TP, 1] i32
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (TP, W), 1)
    Mx = (xrel == w_ids).astype(jnp.float32)  # [TP, W]

    both = jnp.concatenate([s1, n1], axis=1)  # [TP, 2*n_r]
    contrib = jax.lax.dot_general(
        Mx, both, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )  # [W, 2*n_r]

    @pl.when(pt == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(pt != 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


def _body_uniform(power_ref, sprd_ref, rt2_ref, ab_ref, off_ref, vl_ref,
                  xrel_ref, bounds_ref, out_ref):
    """Uniform-dr fused survey tile with in-register bf16x3 binning.

    The XLA exact path pays 6 bf16 MXU passes for the f32 data operand
    (per-operand precision is promoted to the pair's max).  Here the linear
    Sv tile is split hi/mid/lo into three bf16 terms IN REGISTERS — an
    exact decomposition (3x8 mantissa bits > f32's 24), each term one
    native bf16 pass against the exactly-representable 0/1 band — so the
    MXU cost is 3 passes and the exp still runs once per element.

    MEASURED OUTCOME (v5e, bench workload, round 4): 3.47 ms/step at tile
    512 vs 2.83 ms for the XLA exact path — a documented NEGATIVE result:
    at n_r = 50 output lanes the MXU runs ≤40% utilized in either form, so
    halving the passes doesn't reach the ALU, and Mosaic's per-tile
    overhead eats the rest.  Kept with an interpret-mode parity test.
    """
    pt = pl.program_id(1)
    TP, R = power_ref.shape[1], power_ref.shape[2]
    W = out_ref.shape[1]

    power = power_ref[0].astype(jnp.float32)
    if jnp.issubdtype(power_ref.dtype, jnp.integer):
        power = power * jnp.float32(_INDEX2POWER)
    # sv row terms precomputed per channel on host/XLA: sprd carries the
    # spreading log AND the k0 fold (-inf below first valid sample -> lin 0)
    sv = power + sprd_ref[0] + ab_ref[0] * rt2_ref[0] + off_ref[0]
    lin = jnp.exp(sv * jnp.float32(_LN10_OVER_10))
    lane = jax.lax.broadcasted_iota(jnp.int32, (TP, R), 1).astype(jnp.float32)
    lin = jnp.where(lane < vl_ref[0], lin, 0.0)

    bounds = bounds_ref[0]  # [1, n_edges] f32
    n_edges = bounds_ref.shape[2]
    r_col = jax.lax.broadcasted_iota(jnp.int32, (R, n_edges - 1), 0).astype(jnp.float32)
    M = ((r_col >= bounds[0, :-1][None, :]) & (r_col < bounds[0, 1:][None, :]))
    Mb = M.astype(jnp.bfloat16)

    hi = lin.astype(jnp.bfloat16)
    r1 = lin - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    s1 = (
        jnp.dot(hi, Mb, preferred_element_type=jnp.float32)
        + jnp.dot(mid, Mb, preferred_element_type=jnp.float32)
        + jnp.dot(lo, Mb, preferred_element_type=jnp.float32)
    )  # [TP, n_r]

    # closed-form counts: host pre-clips bounds to [k0, R], so only the
    # per-ping valid length clips here
    clipped = jnp.minimum(bounds, vl_ref[0])  # [TP, n_edges]
    n1 = clipped[:, 1:] - clipped[:, :-1]

    xrel = xrel_ref[...]  # [TP, 1] i32
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (TP, W), 1)
    Mx = (xrel == w_ids).astype(jnp.float32)
    both = jnp.concatenate([s1, n1], axis=1)
    contrib = jax.lax.dot_general(
        Mx, both, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pt == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(pt != 0)
    def _accum():
        out_ref[0] = out_ref[0] + contrib


@functools.partial(
    jax.jit, static_argnames=("n_x_window", "n_r", "tile_p", "interpret")
)
def window_partials_pallas_uniform(
    power, sprd_row, rt2_row, absorption, offset, valid_len, x_rel, bounds,
    n_x_window: int, n_r: int, tile_p: int = 512, interpret: bool = False,
):
    """bf16x3 exact fused survey partials, uniform-dr fast path.

    power [C,P,R] int16 (or f32 dB); sprd_row/rt2_row [C,R] f32 per-channel
    rows (spreading log with -inf below k0, and 2*r_tvg); absorption/offset/
    valid_len [C,P] f32; x_rel [P] i32 sorted window-relative ping-bin ids;
    bounds [C, n_r+1] f32 range-bin sample bounds CLIPPED to [k0, R] (so
    bounds[:, 0] == k0 — the counts clip reads it).  P must be a multiple
    of tile_p.  Returns (sums, counts) [C, n_x_window, n_r].
    """
    C, P, R = power.shape
    grid = (C, P // tile_p)
    cp = pl.BlockSpec((1, tile_p, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, R), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _body_uniform,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, R), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            row, row, cp, cp, cp,
            pl.BlockSpec((tile_p, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_r + 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_x_window, 2 * n_r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, n_x_window, 2 * n_r), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(
        power,
        sprd_row[:, None, :], rt2_row[:, None, :],
        absorption[:, :, None], offset[:, :, None], valid_len[:, :, None],
        x_rel[:, None].astype(jnp.int32),
        bounds[:, None, :],
    )
    return out[:, :, :n_r], out[:, :, n_r:]


@functools.partial(
    jax.jit, static_argnames=("n_x_window", "n_r", "tile_p", "interpret")
)
def window_partials_pallas(
    power, dr, tvg_shift, absorption, offset, k0, valid_len, x_rel, bounds,
    n_x_window: int, n_r: int, tile_p: int = 512, interpret: bool = False,
):
    """Fused survey partials (sums, counts) [C, n_x_window, n_r].

    power [C,P,R] int16 indices (scaled in-kernel) or f32 dB;
    dr/tvg_shift/absorption/offset [C,P] f32; k0 [C,P] f32 (first sample with
    r_tvg>0, host-computed in f64); valid_len [C,P] f32; x_rel [P] i32 sorted
    window-relative ping-bin ids (park out-of-window pings at n_x_window);
    bounds [C, n_r+1] f32 range-bin sample bounds (ceil(edge/dr0), clipped to
    [0, R]).  P must be a multiple of tile_p (pad pings, park their x_rel).
    """
    C, P, R = power.shape
    grid = (C, P // tile_p)

    cp = pl.BlockSpec((1, tile_p, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, R), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            cp, cp, cp, cp, cp, cp,
            pl.BlockSpec((tile_p, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_r + 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_x_window, 2 * n_r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, n_x_window, 2 * n_r), jnp.float32),
        # the default 16MB scoped-VMEM limit is too tight for 512-ping tiles
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(
        power,
        dr[:, :, None], tvg_shift[:, :, None], absorption[:, :, None],
        offset[:, :, None], k0[:, :, None], valid_len[:, :, None],
        x_rel[:, None].astype(jnp.int32),
        bounds[:, None, :],
    )
    return out[:, :, :n_r], out[:, :, n_r:]
