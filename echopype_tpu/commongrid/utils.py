"""Host-side helpers for commongrid: bin parsing, edges, position reduction.

Capability parity: echopype/commongrid/utils.py.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..ops.binning import bin_index_np, binned_mean_1d
from ..utils.geodesy import pairwise_distance_nmi
from ..xrlite import DataArray, Dataset

POSITION_VARIABLES = ("latitude", "longitude")

X_BIN_MAP = {
    "range_bin": {
        "name": "Range bin",
        "unit": "m",
        "ex": "10m",
        "unit_label": "meters",
        "pattern": r"([\d+]*[.,]{0,1}[\d+]*)(\s+)?(m)",
    },
    "dist_bin": {
        "name": "Distance bin",
        "unit": "nmi",
        "ex": "0.5nmi",
        "unit_label": "nautical miles",
        "pattern": r"([\d+]*[.,]{0,1}[\d+]*)(\s+)?(nmi)",
    },
}

__all__ = [
    "POSITION_VARIABLES",
    "_parse_x_bin",
    "_setup_and_validate",
    "ping_time_bin_edges",
    "get_distance_from_latlon",
    "get_reduced_positions",
    "parse_time_bin_to_value_unit",
]


def _parse_x_bin(x_bin: str, x_label="range_bin") -> float:
    """Parse '10m' / '0.5nmi' strings (commongrid/utils.py:305)."""
    info = X_BIN_MAP.get(x_label)
    if info is None:
        raise KeyError(f"x_label must be one of {list(X_BIN_MAP)}")
    if not isinstance(x_bin, str):
        raise TypeError("'x_bin' must be a string")
    m = re.match(info["pattern"], x_bin.strip().lower())
    if m is None:
        raise ValueError(
            f"{info['name']} must be in {info['unit_label']} (e.g., '{info['ex']}')."
        )
    return float(m.group(1))


def _setup_and_validate(ds_Sv: Dataset, range_var: str, range_bin: str, closed: str):
    if range_var not in ("echo_range", "depth"):
        raise ValueError("range_var must be one of 'echo_range' or 'depth'.")
    if range_var not in ds_Sv:
        raise ValueError(f"range_var '{range_var}' does not exist in the input dataset.")
    if closed not in ("left", "right"):
        raise ValueError(f"{closed} is not a valid option. Options are 'left' or 'right'.")
    range_bin_val = _parse_x_bin(range_bin, "range_bin")
    return ds_Sv, range_bin_val


def ping_time_bin_edges(ping_time: np.ndarray, ping_time_bin: str) -> np.ndarray:
    """Bin edges matching pandas resample semantics (commongrid/api.py:117-124).

    Resample generates one bin per freq interval from the origin-floored start
    through the last ping; the final right edge is appended.
    """
    idx = pd.DatetimeIndex(np.asarray(ping_time, dtype="datetime64[ns]"))
    s = pd.Series(np.zeros(len(idx)), index=idx)
    d_index = s.resample(ping_time_bin).first().index
    edges = d_index.union([d_index[-1] + pd.Timedelta(ping_time_bin)])
    return np.asarray(edges.values, dtype="datetime64[ns]")


def parse_time_bin_to_value_unit(ping_time_bin: str):
    """'20s' -> (20, 'seconds'), for cell_methods attrs."""
    m = re.match(r"([\d.]+)\s*([a-zA-Z]+)", ping_time_bin.strip())
    if not m:
        raise ValueError(f"Cannot parse time bin {ping_time_bin!r}")
    value = float(m.group(1))
    unit = m.group(2).lower()
    label = {
        "s": "seconds",
        "sec": "seconds",
        "min": "minutes",
        "t": "minutes",
        "h": "hours",
        "d": "days",
        "ms": "milliseconds",
    }.get(unit, unit)
    if value == int(value):
        value = int(value)
    return value, label


def get_distance_from_latlon(ds_Sv: Dataset) -> np.ndarray:
    """Cumulative along-track distance [nmi] per ping (utils.py:210-231).

    Consecutive-segment geodesic distances -> cumulative sum -> ffill/bfill,
    replicating the reference's pandas shift(-1)/cumsum/ffill/bfill exactly.
    """
    lat = np.asarray(ds_Sv["latitude"].values, dtype="f8")
    lon = np.asarray(ds_Sv["longitude"].values, dtype="f8")
    good = ~(np.isnan(lat) | np.isnan(lon))
    if not good.any():
        raise ValueError("All lat/lon entries are NaN!")
    seg = pairwise_distance_nmi(lat, lon)  # seg[i] = dist(p_i, p_{i+1}); NaN-poisoned
    # reference drops rows with NaN current/next position before cumsum
    valid_seg = ~np.isnan(seg)
    dist = np.full(len(lat), np.nan)
    dist[valid_seg] = np.cumsum(seg[valid_seg])
    # ffill then bfill
    dist = _ffill_bfill(dist)
    return dist


def _ffill_bfill(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    mask = np.isnan(x)
    idx = np.where(~mask, np.arange(len(x)), 0)
    np.maximum.accumulate(idx, out=idx)
    x = x[idx]
    # bfill remaining leading NaNs
    mask = np.isnan(x)
    if mask.any() and (~mask).any():
        first_valid = np.argmax(~mask)
        x[:first_valid] = x[first_valid]
    return x


def get_reduced_positions(ds_Sv, ds_X, x_dim, x_idx, n_x):
    """Mean lat/lon per x bin attached to the output (utils.py:453-501).

    Host float64 bincount: positions need ~1e-6 deg accuracy (the output's
    geospatial attrs round to 1e-5), which f32 device reduction can't hold.
    """
    if all(v in ds_Sv for v in POSITION_VARIABLES):
        x_idx = np.asarray(x_idx)
        for var in POSITION_VARIABLES:
            v = np.asarray(ds_Sv[var].values, dtype="f8")
            ok = (x_idx >= 0) & np.isfinite(v)
            sums = np.bincount(x_idx[ok], weights=v[ok], minlength=n_x)
            cnts = np.bincount(x_idx[ok], minlength=n_x)
            with np.errstate(invalid="ignore", divide="ignore"):
                vals = sums / np.where(cnts > 0, cnts, np.nan)
            ds_X[var] = ((x_dim,), vals, dict(ds_Sv[var].attrs))
    return ds_X
