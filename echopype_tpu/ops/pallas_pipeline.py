"""Pallas TPU kernel: single-pass fused calibration + range-bin reduction.

The XLA version of the fused pipeline (parallel/pipeline.sv_mvbs_core_mxu)
reads the power block for the elementwise pass and again for the two bin
matmuls.  This kernel makes the op truly single-pass: each [TP, R] power tile
is read into VMEM once, calibrated (Sv written out), converted to the linear
domain, and contracted on the MXU against the per-channel banded bin matrix —
per-ping bin sums and counts leave as tiny [P, n_r] arrays.  HBM traffic is
one read of power + one write of Sv (+ negligible side outputs), the
bandwidth floor for this op.

Grid: (C, P // TP).  VMEM per step: power/Sv tiles 2 * TP*R*4B, bin matrix
R*n_r*4B — comfortably under the ~16 MB budget for TP=256, R=4000, n_r=64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sv_bin_partials_pallas", "sv_mvbs_core_pallas"]


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def sv_bin_partials_pallas(power, dr, tvg_shift, absorption, offset, bin_matrix,
                           tile_p: int = 128, interpret: bool = False):
    """Fused Sv + per-ping bin partials.

    power [C,P,R] f32; dr/tvg/absorption/offset [C,P] f32;
    bin_matrix [C,R,n_r] f32 (0/1 banded).
    Returns (sv [C,P,R], s1 [C,P,n_r], n1 [C,P,n_r]).
    P must be a multiple of tile_p (pad pings before calling).
    """
    C, P, R = power.shape
    n_r = bin_matrix.shape[2]
    grid = (C, P // tile_p)

    def pp(i, j):
        return (i, j, 0)

    cp_spec = pl.BlockSpec((1, tile_p, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_p, R), pp, memory_space=pltpu.VMEM),
            cp_spec,
            cp_spec,
            cp_spec,
            cp_spec,
            pl.BlockSpec((1, R, n_r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, R), pp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, n_r), pp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, n_r), pp, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, P, R), jnp.float32),
            jax.ShapeDtypeStruct((C, P, n_r), jnp.float32),
            jax.ShapeDtypeStruct((C, P, n_r), jnp.float32),
        ],
        interpret=interpret,
    )(power, dr[:, :, None], tvg_shift[:, :, None], absorption[:, :, None],
      offset[:, :, None], bin_matrix)
    return out


def _kernel_body(power_ref, dr_ref, tvg_ref, ab_ref, off_ref, m_ref, sv_ref, s1_ref, n1_ref):
    TP, R = power_ref.shape[1], power_ref.shape[2]
    power = power_ref[0]
    dr = dr_ref[0]  # [TP, 1]
    r = jax.lax.broadcasted_iota(jnp.int32, (TP, R), 1).astype(jnp.float32) * dr
    r_tvg = r - tvg_ref[0]
    pos = r_tvg > 0
    sv = jnp.where(
        pos,
        power
        + 20.0 * jnp.log10(jnp.where(pos, r_tvg, 1.0))
        + 2.0 * ab_ref[0] * r_tvg
        + off_ref[0],
        jnp.nan,
    )
    sv_ref[0] = sv
    ok = ~jnp.isnan(sv)
    # 10^(x/10) == exp(x * ln(10)/10)
    lin = jnp.where(ok, jnp.exp(sv * jnp.float32(0.23025850929940458)), 0.0)
    m = m_ref[0]
    s1_ref[0] = jnp.dot(lin, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    n1_ref[0] = jnp.dot(ok.astype(jnp.float32), m, preferred_element_type=jnp.float32)  # 0/1 x 0/1: exact at DEFAULT


def sv_mvbs_core_pallas(power, dr, tvg_shift, absorption, offset, x_idx, r_edges, n_x, n_r,
                        tile_p: int = 128, interpret: bool = False):
    """Drop-in for sv_mvbs_core_mxu backed by the single-pass Pallas kernel."""
    C, P, R = power.shape
    dr0 = dr[:, 0]
    bounds = jnp.clip(jnp.ceil(jnp.asarray(r_edges)[None, :] / dr0[:, None]), 0, R)
    r_ids = jax.lax.broadcasted_iota(jnp.float32, (1, R, 1), 1)
    M = ((r_ids >= bounds[:, None, :-1]) & (r_ids < bounds[:, None, 1:])).astype(jnp.float32)

    pad = (-P) % tile_p
    if pad:
        power = jnp.pad(power, ((0, 0), (0, pad), (0, 0)), constant_values=jnp.nan)
        dr = jnp.pad(dr, ((0, 0), (0, pad)), constant_values=1.0)
        tvg_shift = jnp.pad(tvg_shift, ((0, 0), (0, pad)))
        absorption = jnp.pad(absorption, ((0, 0), (0, pad)))
        offset = jnp.pad(offset, ((0, 0), (0, pad)))
    sv, s1, n1 = sv_bin_partials_pallas(
        power, dr, tvg_shift, absorption, offset, M, tile_p=tile_p, interpret=interpret
    )
    if pad:
        sv, s1, n1 = sv[:, :P], s1[:, :P], n1[:, :P]

    xb = jnp.searchsorted(x_idx, jnp.arange(n_x + 1, dtype=x_idx.dtype), side="left")
    xb = jnp.broadcast_to(xb.astype(jnp.int32)[None, :, None], (C, n_x + 1, n_r))

    from ..parallel.pipeline import _prefix_gather_diff as _pgd

    sums = _pgd(s1, xb, 1)
    counts = _pgd(n1, xb, 1)
    return sv, sums, counts


# --------------------------------------------------------------------------
# MVBS-only single-pass kernel: no Sv materialization, one transcendental.
# HBM traffic = one read of power + tiny [C,P,n_r] partials.  lin is formed
# directly: 10^(Sv/10) = 10^((power + 2*a*r_tvg + off)/10) * r_tvg^2, so the
# dB Sv value (and its log10) is never computed.
#
# Measured (v5e, bench workload 5ch x 20k pings x 4000 samples): 14.0 ms/iter
# (tile_p=200) vs 10.2 ms for the XLA path (sv_mvbs_core_mxu with the Sv
# output dead-code-eliminated) -- per-grid-step pipeline overhead dominates at
# VMEM-feasible tile sizes, so the XLA path remains the default; this kernel
# is kept as the explicit single-pass formulation with parity tests.
_LN10_10 = 0.23025850929940458


def _mvbs_kernel_body(power_ref, dr_ref, tvg_ref, ab_ref, off_ref, m_ref, s1_ref, n1_ref):
    TP, R = power_ref.shape[1], power_ref.shape[2]
    power = power_ref[0]
    dr = dr_ref[0]  # [TP, 1]
    r = jax.lax.broadcasted_iota(jnp.int32, (TP, R), 1).astype(jnp.float32) * dr
    r_tvg = r - tvg_ref[0]
    ok = (r_tvg > 0) & ~jnp.isnan(power)
    expo = jnp.float32(_LN10_10) * (power + 2.0 * ab_ref[0] * r_tvg + off_ref[0])
    lin = jnp.where(ok, jnp.exp(expo) * (r_tvg * r_tvg), 0.0)
    m = m_ref[0]
    s1_ref[0] = jnp.dot(lin, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    n1_ref[0] = jnp.dot(ok.astype(jnp.float32), m, preferred_element_type=jnp.float32)  # 0/1 x 0/1: exact at DEFAULT


def _pick_tile_p(P: int, target: int = 512) -> int:
    """Largest multiple-of-8 divisor of P at most target (avoids pad copies)."""
    best = 0
    t = 8
    while t <= min(P, target):
        if P % t == 0:
            best = t
        t += 8
    return best


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def mvbs_partials_pallas(power, dr, tvg_shift, absorption, offset, bin_matrix,
                         tile_p: int = 0, interpret: bool = False):
    """Per-ping bin partials WITHOUT materializing Sv.

    power [C,P,R] f32; dr/tvg/absorption/offset [C,P] f32;
    bin_matrix [C,R,n_r] f32.  Returns (s1 [C,P,n_r], n1 [C,P,n_r]).
    tile_p=0 auto-picks a divisor of P (multiple of 8) so no pad copy of
    the power block is ever made; falls back to padding when P < 8 or P
    has no such divisor.

    VMEM bound: roughly 2*tile_p*R*4B + R*n_r*4B must stay well under the
    ~16 MB per-core budget (tile_p <= ~256 for R=4000); oversizing fails at
    Mosaic compile time with an unhelpful remote-compile INTERNAL error.
    """
    C, P, R = power.shape
    n_r = bin_matrix.shape[2]
    tp = tile_p or _pick_tile_p(P)
    if tp == 0 or P % tp:
        pad = (-P) % max(tp, 8)
        tp = tp or 8
        power = jnp.pad(power, ((0, 0), (0, pad), (0, 0)), constant_values=jnp.nan)
        dr = jnp.pad(dr, ((0, 0), (0, pad)), constant_values=1.0)
        tvg_shift = jnp.pad(tvg_shift, ((0, 0), (0, pad)))
        absorption = jnp.pad(absorption, ((0, 0), (0, pad)))
        offset = jnp.pad(offset, ((0, 0), (0, pad)))
        P = P + pad
    grid = (C, P // tp)

    def pp(i, j):
        return (i, j, 0)

    cp_spec = pl.BlockSpec((1, tp, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    s1, n1 = pl.pallas_call(
        _mvbs_kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tp, R), pp, memory_space=pltpu.VMEM),
            cp_spec,
            cp_spec,
            cp_spec,
            cp_spec,
            pl.BlockSpec((1, R, n_r), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tp, n_r), pp, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, n_r), pp, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, P, n_r), jnp.float32),
            jax.ShapeDtypeStruct((C, P, n_r), jnp.float32),
        ],
        interpret=interpret,
    )(power, dr[:, :, None], tvg_shift[:, :, None], absorption[:, :, None],
      offset[:, :, None], bin_matrix)
    return s1, n1


def mvbs_core_pallas(power, dr, tvg_shift, absorption, offset, x_idx, r_edges, n_x, n_r,
                     tile_p: int = 0, interpret: bool = False):
    """MVBS-only drop-in for sv_mvbs_core_mxu(with_sv=False semantics)."""
    C, P, R = power.shape
    dr0 = dr[:, 0]
    bounds = jnp.clip(jnp.ceil(jnp.asarray(r_edges)[None, :] / dr0[:, None]), 0, R)
    r_ids = jax.lax.broadcasted_iota(jnp.float32, (1, R, 1), 1)
    M = ((r_ids >= bounds[:, None, :-1]) & (r_ids < bounds[:, None, 1:])).astype(jnp.float32)
    s1, n1 = mvbs_partials_pallas(
        power, dr, tvg_shift, absorption, offset, M, tile_p=tile_p, interpret=interpret
    )
    s1, n1 = s1[:, :P], n1[:, :P]

    xb = jnp.searchsorted(x_idx, jnp.arange(n_x + 1, dtype=x_idx.dtype), side="left")
    xb = jnp.broadcast_to(xb.astype(jnp.int32)[None, :, None], (C, n_x + 1, n_r))

    from ..parallel.pipeline import _prefix_gather_diff as _pgd

    return _pgd(s1, xb, 1), _pgd(n1, xb, 1)
