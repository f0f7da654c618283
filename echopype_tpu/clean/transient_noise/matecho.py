"""Matecho-style deep-spike (transient) column detector.

Capability parity: echopype/clean/transient_noise/transient_matecho.py
(from Matecho's DeepSpikeDetection.m, Perrot et al. 2018): flag whole pings
whose deep-window linear-mean Sv exceeds a local percentile + delta_db.
Returned mask: True = VALID (keep).
"""

from __future__ import annotations

import warnings

import numpy as np

from ...utils.compute import _lin2log, _log2lin
from ...xrlite import DataArray

__all__ = ["transient_noise_matecho"]


def _binary_dilation_1d(flags: np.ndarray, extend: int) -> np.ndarray:
    if extend <= 0 or not flags.any():
        return flags
    idx = np.nonzero(flags)[0]
    out = flags.copy()
    for i in idx:
        out[max(0, i - extend) : i + extend + 1] = True
    return out


def _matecho_core(
    sv_rp,
    r,
    bottom_depth=None,
    start_depth=220,
    window_meter=450,
    window_ping=100,
    percentile=25,
    delta_db=12,
    extend_ping=0,
    min_window=20,
):
    """sv_rp: [range, ping]; returns bad column mask [range, ping]."""
    sv = np.asarray(sv_rp, dtype="f8")
    r = np.asarray(r, dtype="f8")
    n_ping = sv.shape[1]
    depth_mask = (r >= start_depth) & (r <= start_depth + window_meter)
    if bottom_depth is None:
        bottom_depth = np.full(n_ping, r[-1], dtype="f8")
    else:
        bottom_depth = np.asarray(bottom_depth, dtype="f8").copy()
        bottom_depth[np.isnan(bottom_depth)] = r[-1]

    pings_bad = np.zeros(n_ping, dtype=bool)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        for j in range(n_ping):
            j0 = max(0, j - window_ping // 2)
            j1 = min(n_ping, j + window_ping // 2)
            local_bottom = np.min(bottom_depth[j0:j1])
            refined = depth_mask & (r < local_bottom)
            if not refined.any():
                continue
            H = (r[1] - r[0]) * refined.sum()
            if H < min_window:
                continue
            sv_window = sv[refined, j0:j1]
            flat = sv_window[~np.isnan(sv_window)]
            if flat.size == 0:
                continue
            pctl = np.percentile(flat, percentile)
            ping_mean_db = _lin2log(np.nanmean(_log2lin(sv[refined, j])))
            if ping_mean_db > pctl + delta_db:
                pings_bad[j] = True

    pings_bad = _binary_dilation_1d(pings_bad, extend_ping)
    mask_bad = np.zeros_like(sv, dtype=bool)
    mask_bad[:, pings_bad] = True
    return mask_bad


def transient_noise_matecho(
    ds,
    var_name: str = "Sv",
    range_var: str = "depth",
    time_var: str = "ping_time",
    bottom_var=None,
    start_depth: float = 220,
    window_meter: float = 450,
    window_ping: int = 100,
    percentile: float = 25,
    delta_db: float = 12,
    extend_ping: int = 0,
    min_window: float = 20,
) -> DataArray:
    """Per-channel Matecho detector; True = VALID (keep)."""
    sv_da = ds[var_name]
    if time_var not in sv_da.dims:
        raise ValueError(f"{time_var!r} must be a dim of {var_name!r}.")
    sv = np.asarray(sv_da.values, dtype="f8")
    rvals = np.asarray(ds[range_var].values, dtype="f8")
    if rvals.ndim == 3:
        rvals = rvals[:, 0, :]
    elif rvals.ndim == 1:
        rvals = np.broadcast_to(rvals, (sv.shape[0], len(rvals)))
    bottom = None
    if bottom_var is not None and bottom_var in ds:
        bottom = np.asarray(ds[bottom_var].values, dtype="f8")

    bad = np.stack(
        [
            _matecho_core(
                sv[c].T,
                rvals[c],
                bottom_depth=bottom[c] if (bottom is not None and bottom.ndim == 2) else bottom,
                start_depth=start_depth,
                window_meter=window_meter,
                window_ping=window_ping,
                percentile=percentile,
                delta_db=delta_db,
                extend_ping=extend_ping,
                min_window=min_window,
            ).T
            for c in range(sv.shape[0])
        ]
    )
    out = DataArray(
        ~bad,
        sv_da.dims,
        attrs={"meaning": "True = VALID (False = transient noise)"},
        name="matecho_mask_valid",
    )
    out.coords = dict(sv_da.coords)
    return out
