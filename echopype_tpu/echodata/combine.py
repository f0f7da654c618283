"""combine_echodata: concatenate converted files along their append dims.

Capability parity: echopype/echodata/combine.py:860 — per-group concat along
the append dims {filenames, time1..4, nmea_time, ping_time, filter_time} with
minimal coords; channel consistency/selection checks; ascending-time check;
all per-file group attributes captured into a Provenance attribute table;
reversed ping times repaired via qc and the originals stored in Provenance.
"""

from __future__ import annotations

import numpy as np

from ..qc.api import _clean_reversed
from ..utils.log import _init_logger
from ..utils.prov import echopype_prov_attrs
from ..xrlite import DataArray, Dataset, concat
from .echodata import EchoData

logger = _init_logger(__name__)

APPEND_DIMS = {
    "filenames",
    "time1",
    "time2",
    "time3",
    "time4",
    "nmea_time",
    "ping_time",
    "filter_time",
}

__all__ = ["combine_echodata", "APPEND_DIMS"]


def _check_eds(echodata_list):
    if not echodata_list or not all(isinstance(ed, EchoData) for ed in echodata_list):
        raise TypeError("The list provided must consist of EchoData objects!")
    models = {ed.sonar_model for ed in echodata_list}
    if None in models:
        raise ValueError("all EchoData objects must have non-None sonar_model values")
    if len(models) > 1:
        raise ValueError("all EchoData objects must have the same sonar_model value")
    paths = [ed.source_file or ed.converted_raw_path for ed in echodata_list]
    if len(set(paths)) != len(paths):
        raise ValueError("EchoData objects have the same source file path")
    return paths


def _check_channel_consistency(all_chan_list, group, channel_selection):
    if channel_selection is None:
        sorted_lists = [sorted(c) for c in all_chan_list]
        if sorted_lists.count(sorted_lists[0]) != len(sorted_lists):
            raise RuntimeError(
                f"All EchoData objects do not have the same channels in group {group}; "
                "supply channel_selection to combine a common subset."
            )
    else:
        for chans in all_chan_list:
            missing = set(channel_selection) - set(chans)
            if missing:
                raise NotImplementedError(
                    f"channel_selection contains channels {sorted(missing)} not present "
                    f"in group {group} of every EchoData object; NaN-padded expansion "
                    "is not implemented."
                )


def _check_ascending_times(ds_list, group):
    for dim in APPEND_DIMS:
        firsts = []
        for ds in ds_list:
            if dim in ds.coords and len(ds.coords[dim].values) and ds.coords[dim].dtype.kind == "M":
                firsts.append(ds.coords[dim].values[0])
        if len(firsts) > 1 and any(b < a for a, b in zip(firsts, firsts[1:])):
            raise RuntimeError(
                f"The first value of {dim} in group {group} is not increasing across the "
                "input EchoData objects; combine in chronological order."
            )


def _select_channels(ds, group, channel_selection):
    if channel_selection is None or "channel" not in ds.sizes:
        return ds
    if isinstance(channel_selection, dict):
        wanted = channel_selection.get(group)
        if wanted is None:
            return ds
    else:
        wanted = [c for c in channel_selection if c in ds.coords["channel"].values]
        if not wanted:
            return ds
    return ds.sel(channel=[c for c in wanted if c in ds.coords["channel"].values.tolist()])


def _capture_prov_attrs(tree_list, paths):
    """Per-file attribute table stored on the Provenance group
    (combine.py:605)."""
    rows = {}
    for fi, tree in enumerate(tree_list):
        for gpath, ds in tree.items():
            for k, v in ds.attrs.items():
                if isinstance(v, (list, tuple, np.ndarray)):
                    continue
                key = f"{gpath.replace('/', '_').replace('-', '_').lower()}_{k}"
                rows.setdefault(key, {})[fi] = str(v)
    n = len(tree_list)
    out = {}
    for key, vals in rows.items():
        out[key] = np.array([vals.get(i, "") for i in range(n)], dtype=object)
    return out


def combine_echodata(echodata_list=None, channel_selection=None) -> EchoData:
    """Combine multiple EchoData objects into one (combine.py:860)."""
    paths = _check_eds(echodata_list)
    if channel_selection is not None and not isinstance(channel_selection, (list, dict)):
        raise TypeError("channel_selection must be a list or a dict")

    group_paths = list(
        dict.fromkeys(g for ed in echodata_list for g in ed.group_paths)
    )

    combined_tree = {}
    old_times = {}
    for group in group_paths:
        ds_list = [ed.get(group) for ed in echodata_list]
        ds_list = [d for d in ds_list if d is not None]
        if not ds_list:
            continue
        if any("channel" in d.sizes for d in ds_list):
            all_chans = [
                list(d.coords["channel"].values) if "channel" in d.coords else []
                for d in ds_list
            ]
            sel = channel_selection if not isinstance(channel_selection, dict) else (
                channel_selection.get(group)
            )
            _check_channel_consistency(all_chans, group, sel)
            ds_list = [_select_channels(d, group, channel_selection) for d in ds_list]
        _check_ascending_times(ds_list, group)

        dims_present = [d for d in APPEND_DIMS if any(d in ds.sizes for ds in ds_list)]
        combined = _concat_multi_dim(ds_list, dims_present)

        # repair reversed times introduced by concatenation
        for dim in dims_present:
            if dim in combined.coords and combined.coords[dim].dtype.kind == "M":
                tvals = combined.coords[dim].values
                if len(tvals) > 1 and (np.diff(tvals) < np.timedelta64(0, "ns")).any():
                    old_times[f"old_{dim}_{group.replace('/', '_')}"] = tvals.copy()
                    combined.coords[dim] = DataArray(
                        _clean_reversed(tvals, win_len=100), (dim,), name=dim
                    )
                    logger.warning(
                        "Reversed %s in combined group %s corrected; original stored in "
                        "Provenance.",
                        dim,
                        group,
                    )
        combined_tree[group] = combined

    # Provenance: source files + per-file attribute table.  When re-combining
    # already-combined stores (combine.py:731-750), each input's Provenance
    # lists multiple originals -- flatten those instead of the store paths.
    prov = combined_tree.get("Provenance", Dataset())
    all_sources = []
    for ed, path in zip(echodata_list, paths):
        in_prov = ed.get("Provenance")
        if in_prov is not None and "source_filenames" in in_prov:
            all_sources.extend(str(f) for f in np.atleast_1d(in_prov["source_filenames"].values))
        else:
            all_sources.append(str(path))
    files = np.array(list(dict.fromkeys(all_sources)), dtype=object)
    # the concatenated Provenance may carry a stale filenames dim; rebuild it
    prov.data_vars.pop("source_filenames", None)
    prov.coords.pop("filenames", None)
    prov["source_filenames"] = (
        ("filenames",),
        files,
        {"long_name": "Source filenames"},
    )
    prov.coords["filenames"] = DataArray(np.arange(len(files)), ("filenames",), name="filenames")
    prov_table = _capture_prov_attrs([ed._tree for ed in echodata_list], paths)
    echodata_filename = np.array([str(p) for p in paths], dtype=object)
    prov["echodata_filename"] = (("echodata_filename",), echodata_filename)
    for key, vals in prov_table.items():
        prov[key] = (("echodata_filename",), vals)
    for name, tvals in old_times.items():
        prov[name] = ((f"{name}_dim",), tvals)
    prov.attrs.update(echopype_prov_attrs("combination"))
    prov.attrs["is_combined"] = True
    combined_tree["Provenance"] = prov

    out = EchoData(
        tree=combined_tree,
        source_file=paths[0],
        sonar_model=echodata_list[0].sonar_model,
    )
    return out


def _concat_multi_dim(ds_list, dims):
    """Concat datasets along each append dim independently.

    Each variable concatenates along the (single) append dim it carries;
    variables with no append dim come from the first dataset (the
    xr.concat(coords="minimal", data_vars="minimal") behavior the reference
    applies per dim, combine.py:804-817).
    """
    if not dims:
        return ds_list[0]
    first = ds_list[0]
    out = Dataset(attrs=dict(first.attrs))
    for k, coord in first.coords.items():
        cdims = [d for d in dims if d in coord.dims]
        if cdims:
            dim = cdims[0]
            ax = coord.dims.index(dim)
            vals = np.concatenate(
                [np.asarray(ds.coords[k].values) for ds in ds_list if k in ds.coords], axis=ax
            )
            out.coords[k] = DataArray(vals, coord.dims, attrs=coord.attrs, name=k)
        else:
            out.coords[k] = coord
    for name, var in first.data_vars.items():
        vdims = [d for d in dims if d in var.dims]
        if vdims and all(name in ds.data_vars for ds in ds_list):
            dim = vdims[0]
            ax = var.dims.index(dim)
            pieces = [np.asarray(ds.data_vars[name].values) for ds in ds_list]
            # pad non-concat axes (e.g. range_sample) to the widest file
            tgt = [max(p.shape[i] for p in pieces) for i in range(pieces[0].ndim)]
            padded = []
            for p in pieces:
                pad = [(0, tgt[i] - p.shape[i]) if i != ax else (0, 0) for i in range(p.ndim)]
                if any(hi for _, hi in pad):
                    fillv = np.nan if p.dtype.kind in "fc" else 0
                    p = np.pad(p, pad, constant_values=fillv)
                padded.append(p)
            vals = np.concatenate(padded, axis=ax)
            out.data_vars[name] = DataArray(vals, var.dims, attrs=var.attrs, name=name)
        else:
            out.data_vars[name] = var
    # widen range_sample-like coords if padding grew them
    for k, coord in list(out.coords.items()):
        n_used = None
        for var in out.data_vars.values():
            if k in var.dims and k not in dims:
                n_used = var.sizes[k]
        if n_used is not None and coord.ndim == 1 and len(coord.values) < n_used:
            if np.issubdtype(coord.dtype, np.integer):
                out.coords[k] = DataArray(np.arange(n_used), (k,), attrs=coord.attrs, name=k)
    return out


def check_zarr_path(zarr_path, storage_options: dict = None, overwrite: bool = False) -> str:
    """Validate a combine output zarr path (reference: combine.py check_zarr_path)."""
    from pathlib import Path

    from ..utils.io import validate_output_path

    if zarr_path is not None:
        if not isinstance(zarr_path, (str, Path)):
            raise TypeError(
                "The provided zarr_path input must be of type string or pathlib.Path!"
            )
        if Path(str(zarr_path)).suffix != ".zarr":
            raise ValueError("The provided zarr_path input must have a '.zarr' suffix!")
    return validate_output_path(
        source_file="combined_echodata.zarr",
        engine="zarr",
        output_storage_options=storage_options or {},
        save_path=zarr_path,
    )


def check_eds(echodata_list):
    """Validate EchoData inputs for combining: nonempty, same sonar_model,
    version attrs collected (reference: combine.py check_eds)."""
    return _check_eds(echodata_list)
