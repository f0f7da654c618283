"""Device kernels for binned echo-integration (MVBS/NASC).

Replaces the reference's flox map-reduce groupby
(echopype/commongrid/utils.py:504-628) with an XLA segment-reduction: Sv is
converted to the linear domain, scattered into (x_bin, range_bin) segments
per channel with one fused pass, and normalized.  Per-shard partial sums +
``psum`` over the mesh give the multi-chip path (see parallel/).

Bin-index computation matches pandas IntervalIndex semantics exactly
(left-closed [lo, hi) or right-closed (lo, hi]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bin_index", "binned_mean_linear", "binned_sum_partials", "bin_index_np"]


def bin_index_np(values: np.ndarray, edges: np.ndarray, closed: str = "left") -> np.ndarray:
    """Bin index per element, -1 where outside all bins (host, numpy).

    Matches pd.IntervalIndex.from_breaks(edges, closed=closed) membership.
    """
    right = closed == "right"
    idx = np.digitize(values, edges, right=right) - 1
    n_bins = len(edges) - 1
    invalid = (idx < 0) | (idx >= n_bins)
    if values.dtype.kind == "f":
        invalid |= np.isnan(values)
    return np.where(invalid, -1, idx).astype("i4")


def bin_index(values, edges, closed: str = "left"):
    """Device-side bin index (same semantics as :func:`bin_index_np`)."""
    right = closed == "right"
    # jnp.digitize(x, bins, right) uses same convention as numpy
    idx = jnp.digitize(values, edges, right=right) - 1
    n_bins = edges.shape[0] - 1
    invalid = (idx < 0) | (idx >= n_bins) | jnp.isnan(values)
    return jnp.where(invalid, -1, idx).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_x", "n_r", "skipna"))
def binned_sum_partials(sv_db, x_idx, r_idx, n_x: int, n_r: int, skipna: bool = True):
    """Partial linear-domain sums+counts per (channel, x_bin, range_bin).

    Parameters
    ----------
    sv_db : f32 [C, P, R]
    x_idx : i32 [P]      x-axis bin per ping (-1 = no bin)
    r_idx : i32 [C, P, R] range bin per sample (-1 = no bin)

    Returns (sums, counts), each f32 [C, n_x, n_r].  Summing these across
    shards (psum) then normalizing reproduces the global mean exactly —
    this is the map-reduce contract flox provides in the reference.
    """
    C, P, R = sv_db.shape
    sv_lin = jnp.power(10.0, sv_db / 10.0)
    in_bin = (x_idx[None, :, None] >= 0) & (r_idx >= 0)
    if skipna:
        ok = in_bin & ~jnp.isnan(sv_db)
        vals = jnp.where(ok, sv_lin, 0.0)
        cnt = ok
    else:
        # NaNs inside a bin poison it (plain mean semantics)
        vals = jnp.where(in_bin, sv_lin, 0.0)
        cnt = in_bin
    seg = jnp.where(in_bin, x_idx[None, :, None] * n_r + r_idx, n_x * n_r)

    def per_channel(v, c, s):
        sums = jax.ops.segment_sum(v.ravel(), s.ravel(), num_segments=n_x * n_r + 1)
        counts = jax.ops.segment_sum(
            c.ravel().astype(jnp.float32), s.ravel(), num_segments=n_x * n_r + 1
        )
        return sums[:-1], counts[:-1]

    sums, counts = jax.vmap(per_channel)(vals, cnt, seg)
    return sums.reshape(C, n_x, n_r), counts.reshape(C, n_x, n_r)


@partial(jax.jit, static_argnames=("n_x", "n_r"))
def binned_sum_raw(values, x_idx, r_idx, n_x: int, n_r: int):
    """NaN-skipping raw sum per (channel, x_bin, range_bin): f32 [C, n_x, n_r]."""
    C, P, R = values.shape
    in_bin = (x_idx[None, :, None] >= 0) & (r_idx >= 0) & ~jnp.isnan(values)
    vals = jnp.where(in_bin, values, 0.0)
    seg = jnp.where(in_bin, x_idx[None, :, None] * n_r + r_idx, n_x * n_r)

    def per_channel(v, s):
        return jax.ops.segment_sum(v.ravel(), s.ravel(), num_segments=n_x * n_r + 1)[:-1]

    return jax.vmap(per_channel)(vals, seg).reshape(C, n_x, n_r)


@partial(jax.jit, static_argnames=("n_x", "n_r", "skipna"))
def binned_mean_linear(sv_db, x_idx, r_idx, n_x: int, n_r: int, skipna: bool = True):
    """Mean of linear Sv per bin, back in dB: f32 [C, n_x, n_r] (NaN = empty)."""
    sums, counts = binned_sum_partials(sv_db, x_idx, r_idx, n_x, n_r, skipna)
    mean = sums / jnp.where(counts > 0, counts, 1.0)
    mean = jnp.where(counts > 0, mean, jnp.nan)
    return 10.0 * jnp.log10(mean)


@partial(jax.jit, static_argnames=("n_x",))
def binned_mean_1d(values, x_idx, n_x: int):
    """NaN-mean of a [P] or [P,...] array per x bin (for lat/lon reduction)."""
    ok = (x_idx >= 0) & ~jnp.isnan(values)
    seg = jnp.where(x_idx >= 0, x_idx, n_x)
    sums = jax.ops.segment_sum(jnp.where(ok, values, 0.0), seg, num_segments=n_x + 1)
    counts = jax.ops.segment_sum(ok.astype(jnp.float32), seg, num_segments=n_x + 1)
    mean = sums[:-1] / jnp.where(counts[:-1] > 0, counts[:-1], 1.0)
    return jnp.where(counts[:-1] > 0, mean, jnp.nan)
