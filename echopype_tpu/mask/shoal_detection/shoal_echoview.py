"""Echoview-style shoal detector with candidate linking.

Capability parity: echopype/mask/shoal_detection/shoal_echoview.py:7 (echopy):
threshold -> drop small candidates -> link components within a search box ->
drop small linked shoals.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage as ndi

from ...xrlite import DataArray

__all__ = ["shoal_echoview"]


def shoal_echoview(
    ds,
    var_name: str = "Sv",
    channel: str = None,
    idim: np.ndarray = None,
    jdim: np.ndarray = None,
    thr: float = -70.0,
    mincan=(3.0, 10.0),
    maxlink=(3.0, 15.0),
    minsho=(3.0, 15.0),
) -> DataArray:
    if var_name not in ds:
        raise ValueError(f"Variable '{var_name}' not found in dataset")
    var = ds[var_name]
    if "channel" in var.dims:
        if channel is None:
            raise ValueError("Please specify channel for multi-channel data")
        var = var.sel(channel=channel)

    sv = np.asarray(var.transpose("range_sample", "ping_time").values, dtype="f8")
    n_range, n_ping = sv.shape
    if idim is None:
        idim = np.arange(n_range + 1, dtype="f8")
    if jdim is None:
        jdim = np.arange(n_ping + 1, dtype="f8")
    idim, jdim = np.asarray(idim, dtype="f8"), np.asarray(jdim, dtype="f8")
    if np.isnan(idim).any() or np.isnan(jdim).any():
        raise ValueError("idim and jdim must not contain NaN")

    mask = sv > thr

    # 2. remove candidates smaller than mincan
    labeled = ndi.label(mask, np.ones((3, 3)))[0]
    for cl in range(1, labeled.max() + 1):
        idx, jdx = np.nonzero(labeled == cl)
        if len(idx) == 0:
            continue
        height = idim[idx.max() + 1] - idim[idx.min()]
        width = jdim[jdx.max() + 1] - jdim[jdx.min()]
        if height < mincan[0] or width < mincan[1]:
            mask[idx, jdx] = False

    # 3. link neighbouring components within expanded bounding boxes
    linked = np.zeros(mask.shape, dtype=int)
    labeled = ndi.label(mask, np.ones((3, 3)))[0]
    for fl in range(1, labeled.max() + 1):
        shoal = labeled == fl
        if not shoal.any():
            continue
        ii, jj = np.nonzero(shoal)
        i0, i1 = ii.min(), ii.max()
        j0, j1 = jj.min(), jj.max()
        i00 = int(np.nanargmin(np.abs(idim - (idim[i0] - (maxlink[0] + 1)))))
        i11 = int(np.nanargmin(np.abs(idim - (idim[i1] + (maxlink[0] + 1))))) + 1
        j00 = int(np.nanargmin(np.abs(jdim - (jdim[j0] - (maxlink[1] + 1)))))
        j11 = int(np.nanargmin(np.abs(jdim - (jdim[j1] + (maxlink[1] + 1))))) + 1
        around = np.zeros_like(mask, dtype=bool)
        around[i00:i11, j00:j11] = True
        neighbour_labels = np.unique(labeled[around & mask])
        neighbour_labels = neighbour_labels[neighbour_labels != 0]
        neighbours = np.isin(labeled, neighbour_labels)
        former = np.unique(linked[neighbours])
        former = former[former != 0]
        if len(former) == 0:
            linked[neighbours] = linked.max() + 1
        else:
            minlabel = former.min()
            linked[neighbours] = minlabel
            for fl2 in former:
                linked[linked == fl2] = minlabel

    # 4. remove linked shoals smaller than minsho
    for ll in np.unique(linked[linked != 0]):
        idx, jdx = np.nonzero(linked == ll)
        height = idim[idx.max() + 1] - idim[idx.min()]
        width = jdim[jdx.max() + 1] - jdim[jdx.min()]
        if height < minsho[0] or width < minsho[1]:
            mask[idx, jdx] = False

    out = DataArray(
        mask.T.astype(bool),
        ("ping_time", "range_sample"),
        coords={
            "ping_time": ds.coords["ping_time"],
            "range_sample": ds.coords["range_sample"],
        },
        attrs={"description": f"Shoal mask using Echoview algorithm on {var_name}"},
        name="shoal_mask",
    )
    return out
