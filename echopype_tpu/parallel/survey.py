"""Survey runner: stream converted stores through the device pipeline.

The domain's scale-out story (SURVEY.md §2.6): a survey is a sequence of
converted stores; each store's power block streams to the device in
ping-chunks, runs the fused calibration+binning step, and partial bin
sums+counts accumulate into survey-global MVBS bins.  Zarr stores are the
spill/checkpoint tier; HBM holds only the active chunk.  On a mesh, chunks
shard over the ping axis and partials combine with a psum (sharded step);
accumulation across chunks is associative so the stream order is free.
"""

from __future__ import annotations

import numpy as np

from ..ops import binning
from ..utils.compute import _lin2log
from ..utils.profiling import StageTimer
from ..xrlite import DataArray, Dataset

__all__ = ["run_survey_mvbs"]


def run_survey_mvbs(
    sv_sources,
    range_bin_m: float = 20.0,
    ping_time_bin: str = "20s",
    range_var: str = "echo_range",
    chunk_pings: int = 5000,
    timer: StageTimer = None,
):
    """Stream Sv stores/datasets into survey-global MVBS bins.

    sv_sources : iterable of Dataset or store paths (calibrated Sv datasets,
        chronologically ordered).
    Returns an MVBS Dataset on the union (ping_time-bin, range-bin) grid.
    """
    from ..commongrid.utils import ping_time_bin_edges
    from ..utils.io import open_source

    timer = timer or StageTimer()

    # pass 1: global extents (cheap: coords + range max only)
    datasets = []
    with timer.stage("scan_extents"):
        t_min = t_max = None
        r_max = 0.0
        for src in sv_sources:
            ds = open_source(src, "dataset")
            datasets.append(ds)
            pt = np.asarray(ds.coords["ping_time"].values, dtype="datetime64[ns]")
            t_min = pt.min() if t_min is None else min(t_min, pt.min())
            t_max = pt.max() if t_max is None else max(t_max, pt.max())
            r_max = max(r_max, float(np.nanmax(np.asarray(ds[range_var].values, dtype="f8"))))
        if not datasets:
            raise ValueError("no Sv sources provided")

    ping_edges = ping_time_bin_edges(
        np.array([t_min, t_max], dtype="datetime64[ns]"), ping_time_bin
    )
    range_edges = np.arange(0, r_max + range_bin_m, range_bin_m)
    n_x, n_r = len(ping_edges) - 1, len(range_edges) - 1

    chans = None
    sums = counts = None
    for ds in datasets:
        ch = list(ds.coords["channel"].values)
        if chans is None:
            chans = ch
            sums = np.zeros((len(chans), n_x, n_r), dtype="f8")
            counts = np.zeros_like(sums)
        elif ch != chans:
            raise ValueError("all Sv sources must share the same channels")
        pt = np.asarray(ds.coords["ping_time"].values, dtype="datetime64[ns]")
        sv_all = np.asarray(ds["Sv"].values, dtype="f4")
        er_all = np.asarray(ds[range_var].values, dtype="f4")
        if er_all.shape != sv_all.shape:
            er_all = np.broadcast_to(er_all, sv_all.shape)
        n_ping = sv_all.shape[1]
        for lo in range(0, n_ping, chunk_pings):
            hi = min(lo + chunk_pings, n_ping)
            with timer.stage("device_binning") as hold:
                x_bounds = binning.x_bounds_np(
                    pt[lo:hi].astype("i8"), ping_edges.astype("i8")
                )
                s, c, _ = binning.binned_sum_partials(
                    sv_all[:, lo:hi],
                    er_all[:, lo:hi],
                    range_edges.astype("f4"),
                    x_bounds,
                )
                hold.extend([s, c])
            with timer.stage("accumulate"):
                sums += np.asarray(s, dtype="f8")
                counts += np.asarray(c, dtype="f8")

    with timer.stage("finalize"):
        with np.errstate(invalid="ignore", divide="ignore"):
            mvbs = np.where(counts > 0, _lin2log(sums / np.maximum(counts, 1)), np.nan)
        out = Dataset(
            coords={
                "channel": np.asarray(chans, dtype=object),
                "ping_time": ping_edges[:-1],
                range_var: range_edges[:-1],
            }
        )
        out["Sv"] = (("channel", "ping_time", range_var), mvbs)
        out.attrs["stage_timing"] = str(timer.report(log=False))
    return out
