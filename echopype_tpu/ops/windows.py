"""Device kernels for rolling-window noise statistics (clean/*).

SURVEY.md §2.4 plans the reference's pooled-Sv comparisons
(echopype/clean/utils.py:29-181) as windowed device kernels.  The mean
pooling here is the separable two-pass scheme on XLA: per-ping depth-window
sums via cumsum + vmapped binary search bands, then ping-window sums via a
second cumsum — O(N) work, no scatter, jit end to end.  Median windows stay
host-side (sliding nanmedian needs per-window sorts that XLA handles poorly).

NaN depths are assumed to be suffix padding (the ragged-ping norm, same as
the binning kernels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["pool_sv_nanmean_device", "downsample_upsample_depth_device"]


def _cumsum_band_diff(values, lo, hi, axis):
    """Sum of values[lo:hi) windows via zero-prepended cumsum gathers."""
    cs = jnp.cumsum(values, axis=axis)
    pad = [(0, 0)] * values.ndim
    pad[axis] = (1, 0)
    cs = jnp.pad(cs, pad)
    return jnp.take_along_axis(cs, hi, axis=axis) - jnp.take_along_axis(cs, lo, axis=axis)


@partial(jax.jit, static_argnames=("num_side_pings",))
def pool_sv_nanmean_device(sv, depth, depth_bin, num_side_pings: int, exclude_above):
    """Windowed nanmean pooling of Sv in the linear domain (device).

    sv, depth: [C, P, R] (depth monotone along R, NaN suffix allowed).
    Matches clean/utils.pool_Sv_nanmean's validity rules: output is NaN where
    the depth window leaves [d_min, d_max] or exclude_above, or the ping
    window leaves [0, P).
    """
    C, P, R = sv.shape
    lin = jnp.power(10.0, sv / 10.0)
    lin_f = jnp.where(jnp.isnan(sv), 0.0, lin)
    cnt = (~jnp.isnan(sv)).astype(jnp.float32)

    d_search = jnp.where(jnp.isnan(depth), jnp.inf, depth)

    def row_band(d_row):
        lo = jnp.searchsorted(d_row, d_row - depth_bin, side="left")
        hi = jnp.searchsorted(d_row, d_row + depth_bin, side="right")
        return lo.astype(jnp.int32), hi.astype(jnp.int32)

    lo, hi = jax.vmap(jax.vmap(row_band))(d_search)  # [C, P, R] each

    s1 = _cumsum_band_diff(lin_f, lo, hi, axis=2)
    n1 = _cumsum_band_diff(cnt, lo, hi, axis=2)

    p_idx = jnp.arange(P)
    p_lo = jnp.maximum(p_idx - num_side_pings, 0).astype(jnp.int32)
    p_hi = (jnp.minimum(p_idx + num_side_pings, P - 1) + 1).astype(jnp.int32)
    p_lo3 = jnp.broadcast_to(p_lo[None, :, None], (C, P, s1.shape[2]))
    p_hi3 = jnp.broadcast_to(p_hi[None, :, None], (C, P, s1.shape[2]))
    sw = _cumsum_band_diff(s1, p_lo3, p_hi3, axis=1)
    nw = _cumsum_band_diff(n1, p_lo3, p_hi3, axis=1)

    pooled = jnp.where(nw > 0, 10.0 * jnp.log10(sw / jnp.maximum(nw, 1.0)), jnp.nan)

    d_min = jnp.nanmin(depth, axis=(1, 2), keepdims=True)
    d_max = jnp.nanmax(depth, axis=(1, 2), keepdims=True)
    valid = (
        (depth - depth_bin >= d_min)
        & (depth + depth_bin <= d_max)
        & (depth - depth_bin >= exclude_above)
        & (p_idx[None, :, None] - num_side_pings >= 0)
        & (p_idx[None, :, None] + num_side_pings <= P)
    )
    return jnp.where(valid, pooled, jnp.nan)


@partial(jax.jit, static_argnames=("n_bins",))
def downsample_upsample_depth_device(sv, bin_idx, n_bins: int):
    """Depth-bin linear mean then broadcast back per sample (device).

    bin_idx: i32 [C, P, R] nondecreasing along R (depth bins are contiguous
    runs — scatter-free: per-bin boundary positions come from one vmapped
    searchsorted, sums from cumsum band diffs).
    Returns (down [C, P, n_bins] dB, up [C, P, R] dB).
    """
    lin = jnp.power(10.0, sv / 10.0)
    lin_f = jnp.where(jnp.isnan(sv), 0.0, lin)
    cnt = (~jnp.isnan(sv)).astype(jnp.float32)

    def row_bounds(idx_row):
        return jnp.searchsorted(
            idx_row, jnp.arange(n_bins + 1, dtype=idx_row.dtype), side="left"
        ).astype(jnp.int32)

    xb = jax.vmap(jax.vmap(row_bounds))(bin_idx)  # [C, P, n_bins+1]
    lo, hi = xb[:, :, :-1], xb[:, :, 1:]
    sums = _cumsum_band_diff(lin_f, lo, hi, axis=2)
    counts = _cumsum_band_diff(cnt, lo, hi, axis=2)
    down = jnp.where(counts > 0, 10.0 * jnp.log10(sums / jnp.maximum(counts, 1.0)), jnp.nan)
    up = jnp.take_along_axis(down, bin_idx, axis=2)
    return down, up
