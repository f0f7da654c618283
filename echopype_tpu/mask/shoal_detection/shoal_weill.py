"""Weill et al. (1993) MOVIES-B shoal contiguity detector.

Capability parity: echopype/mask/shoal_detection/shoal_weill.py:6 (echopy):
threshold, fill short vertical/horizontal gaps (not touching boundaries),
drop features below minimum extent.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

from ...xrlite import DataArray

__all__ = ["shoal_weill"]


def _fill_gaps_1d(mask_1d: np.ndarray, max_gap: int) -> np.ndarray:
    """Fill False runs of length <= max_gap not touching either boundary."""
    n = len(mask_1d)
    labelled = ndi.label(~mask_1d)[0]
    if labelled.max() == 0:
        return mask_1d
    out = mask_1d.copy()
    for lab in range(1, labelled.max() + 1):
        idx = np.nonzero(labelled == lab)[0]
        if len(idx) <= max_gap and 0 not in idx and (n - 1) not in idx:
            out[idx] = True
    return out


def shoal_weill(
    ds,
    var_name: str = "Sv",
    channel: str = None,
    thr: float = -70.0,
    maxvgap: int = 5,
    maxhgap: int = 0,
    minvlen: int = 0,
    minhlen: int = 0,
) -> DataArray:
    if var_name not in ds:
        raise ValueError(f"Variable '{var_name}' not found in dataset")
    var = ds[var_name]
    if "channel" in var.dims:
        if channel is None:
            raise ValueError("Please specify 'channel' for multi-channel data.")
        var = var.sel(channel=channel)
    if not {"ping_time", "range_sample"} <= set(var.dims):
        raise ValueError(f"'{var_name}' must have dims ping_time and range_sample")

    sv = np.asarray(var.transpose("range_sample", "ping_time").values, dtype="f8")
    mask = sv > thr

    n_range, n_ping = mask.shape
    if maxvgap > 0:
        for j in range(n_ping):
            mask[:, j] = _fill_gaps_1d(mask[:, j], maxvgap)
    if maxhgap > 0:
        for i in range(n_range):
            mask[i, :] = _fill_gaps_1d(mask[i, :], maxhgap)

    if minvlen > 0 or minhlen > 0:
        features = ndi.label(mask)[0]
        for lab in range(1, features.max() + 1):
            ii, jj = np.nonzero(features == lab)
            if len(ii) == 0:
                continue
            vlen = int(ii.max() - ii.min() + 1)
            hlen = int(jj.max() - jj.min() + 1)
            if vlen < minvlen or hlen < minhlen:
                mask[ii, jj] = False

    out = DataArray(
        mask.T.astype(bool),
        ("ping_time", "range_sample"),
        coords={
            "ping_time": ds.coords["ping_time"],
            "range_sample": ds.coords["range_sample"],
        },
        attrs={
            "description": f"Weill-style threshold+gap-fill mask on '{var_name}'",
            "threshold_dB": float(thr),
            "maxvgap": int(maxvgap),
            "maxhgap": int(maxhgap),
            "minvlen": int(minvlen),
            "minhlen": int(minhlen),
            **({"channel": str(channel)} if channel is not None else {}),
        },
        name="shoal_mask_weill",
    )
    return out
