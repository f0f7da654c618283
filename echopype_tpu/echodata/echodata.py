"""EchoData: the standardized SONAR-netCDF4 group-tree container.

Capability parity: echopype/echodata/echodata.py:43-730.  Internally a flat
{group_path: Dataset} mapping (the "SonarBundle" of SURVEY.md §7) rather than
a DataTree; the on-disk format is the same zarr group tree.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import storage
from ..utils.prov import ECHOPYPE_TPU_VERSION
from ..xrlite import Dataset
from .convention import GROUP_MAP

__all__ = ["EchoData"]

#: EK60 power data recording start offset correction (echodata.py:32)
TVG_CORRECTION_FACTOR = {"EK60": 2, "ES70": 2}


class EchoData:
    """Container for converted sonar data, one Dataset per convention group."""

    group_map = GROUP_MAP

    def __init__(self, tree=None, source_file=None, sonar_model=None, converted_raw_path=None):
        self._tree: dict = dict(tree) if tree else {}
        self.source_file = source_file
        self.sonar_model = sonar_model or self._infer_sonar_model()
        self.converted_raw_path = converted_raw_path

    def _infer_sonar_model(self):
        top = self._tree.get("Top-level")
        if top is not None:
            return top.attrs.get("keywords")
        return None

    # -------------------------------------------------------------- tree API
    def __getitem__(self, group_path: str) -> Dataset:
        if group_path in ("Top-level", "/"):
            group_path = "Top-level"
        if group_path not in self._tree:
            raise KeyError(
                f"Group {group_path!r} not found; available: {sorted(self._tree)}"
            )
        return self._tree[group_path]

    def __setitem__(self, group_path: str, ds: Dataset):
        if not isinstance(ds, Dataset):
            raise TypeError("EchoData groups must be xrlite Datasets")
        self._tree[group_path] = ds

    def __contains__(self, group_path: str):
        return group_path in self._tree

    def get(self, group_path, default=None):
        return self._tree.get(group_path, default)

    @property
    def group_paths(self):
        return tuple(self._tree.keys())

    @property
    def nbytes(self):
        return float(sum(ds.nbytes for ds in self._tree.values()))

    @property
    def version_info(self):
        return tuple(int(x) for x in ECHOPYPE_TPU_VERSION.split(".")[:3])

    def __repr__(self):
        lines = [f"<EchoData: standardized raw data from {self.source_file or self.converted_raw_path}>"]
        for path, ds in self._tree.items():
            lines.append(f"  {path}: {dict(ds.sizes)}")
        return "\n".join(lines)

    def _repr_html_(self):
        """Jupyter tree repr (capability parity: echodata/widgets/utils.py:65)."""
        rows = [
            "<div><strong>EchoData: standardized raw data from "
            f"{self.source_file or self.converted_raw_path or '(in memory)'}</strong><ul>"
        ]
        for path, ds in self._tree.items():
            dims = ", ".join(f"{k}: {v}" for k, v in ds.sizes.items())
            n_vars = len(ds.data_vars)
            descr = ds.attrs.get("description", "")
            rows.append(
                f"<li><b>{path}</b> ({dims}) — {n_vars} variables"
                + (f" <i>{descr}</i>" if descr else "")
                + "</li>"
            )
        rows.append("</ul></div>")
        return "".join(rows)

    # ----------------------------------------------------------------- io
    def to_zarr(self, save_path, overwrite=False, compress=True, storage_options=None, **kw):
        """Serialize the group tree to a zarr store (local path or fsspec URL)."""
        storage.write_tree(
            save_path, self._tree, compress=compress, overwrite=overwrite,
            storage_options=storage_options,
            chunk_spec=getattr(self, "_chunk_spec", None),
        )
        self.converted_raw_path = str(save_path)
        return str(save_path)

    def to_netcdf(self, save_path, overwrite=False, compress=True, storage_options=None, **kw):
        """Serialize the group tree as one netCDF4 (HDF5) file.

        Reference parity: echodata/echodata.py:586 ``to_netcdf`` via the
        netcdf4 xarray engine; here written directly as the netCDF4-on-HDF5
        profile (dimension scales + DIMENSION_LIST) through h5py.
        """
        storage.write_netcdf_tree(
            save_path, self._tree, compress=compress, overwrite=overwrite,
            storage_options=storage_options,
        )
        self.converted_raw_path = str(save_path)
        return str(save_path)

    @classmethod
    def from_file(cls, converted_raw_path, storage_options=None, **kw) -> "EchoData":
        from ..utils.io import is_remote_path, source_exists

        path = converted_raw_path if is_remote_path(converted_raw_path) else Path(converted_raw_path)
        if not source_exists(path, storage_options):
            raise FileNotFoundError(str(path))
        suffix = "." + str(path).rsplit(".", 1)[-1] if "." in str(path) else ""
        if suffix in (".nc", ".netcdf4", ".h5") and (
            is_remote_path(path) or Path(path).is_file()
        ):
            tree = storage.open_netcdf_tree(path, storage_options=storage_options)
        else:
            tree = storage.open_zarr_tree(path, storage_options=storage_options)
        ed = cls(tree=tree, converted_raw_path=str(path))
        prov = tree.get("Provenance")
        if prov is not None:
            ed.source_file = prov.attrs.get("source_file")
        return ed

    def chunk(self, chunk_dict=None):
        """Record a per-dimension chunking request for serialization.

        Arrays stay eager host arrays (device sharding handles compute
        scale), but the requested chunking is honored by to_zarr's
        encodings — the role the reference's rechunk-all-groups plays
        (echodata.py:697-730).
        """
        if chunk_dict:
            spec = dict(getattr(self, "_chunk_spec", None) or {})
            spec.update(chunk_dict)
            self._chunk_spec = spec
        return self

    def cleanup_swap_files(self):
        """Delete memmap swap files created by open_raw(use_swap=...)
        (echodata.py:77-104)."""
        swap_dir = getattr(self, "swap_dir", None)
        if swap_dir is None:
            return
        import shutil

        # drop memmap references so the files can be unlinked on all platforms
        for ds in self._tree.values():
            for da in ds.data_vars.values():
                if isinstance(da.values, np.memmap):
                    da.values = np.asarray(da.values).copy()
        shutil.rmtree(swap_dir, ignore_errors=True)
        self.swap_dir = None
        self.swap_files = []

    def __del__(self):
        try:
            if getattr(self, "swap_dir", None) is not None:
                import shutil

                shutil.rmtree(self.swap_dir, ignore_errors=True)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass

    # ------------------------------------------------------------- platform
    def update_platform(
        self, extra_platform_data, variable_mappings=None, extra_platform_data_file_name=None
    ):
        """Merge external platform data (e.g. ship GPS) into the Platform group.

        Capability parity: echodata.py:349-517 — new variables arrive on fresh
        timeN dims clipped to the data time range.
        """
        if variable_mappings is None:
            raise ValueError("variable_mappings is required")
        platform = self._tree["Platform"]
        # next free timeN index
        existing = [d for d in platform.sizes if d.startswith("time")]
        next_idx = max([int(d[4:]) for d in existing if d[4:].isdigit()], default=0) + 1

        beam = self._tree.get("Sonar/Beam_group1")
        tmin, tmax = None, None
        if beam is not None and "ping_time" in beam.coords:
            pt = beam.coords["ping_time"].values
            if len(pt):
                tmin, tmax = pt.min(), pt.max()

        time_dim_for = {}
        for plat_name, ext_name in variable_mappings.items():
            if ext_name not in extra_platform_data:
                continue
            ext = extra_platform_data[ext_name]
            src_time_dims = [d for d in ext.dims if "time" in d.lower()]
            src_time = src_time_dims[0] if src_time_dims else None
            if src_time is None:
                platform[plat_name] = ((), np.asarray(ext.values).reshape(()))
                continue
            key = src_time
            if key not in time_dim_for:
                time_dim_for[key] = f"time{next_idx}"
                next_idx += 1
            new_dim = time_dim_for[key]
            tvals = ext.coords[src_time].values
            vals = ext.values
            if tmin is not None and len(tvals):
                # clip to data time range, keeping one sample beyond each edge
                keep = (tvals >= tmin) & (tvals <= tmax)
                lo = np.searchsorted(tvals, tmin)
                hi = np.searchsorted(tvals, tmax, side="right")
                keep[max(lo - 1, 0)] = True
                keep[min(hi, len(tvals) - 1)] = True
                tvals = tvals[keep]
                vals = vals[keep]
            platform._set_coord(new_dim, (new_dim, tvals))
            platform[plat_name] = ((new_dim,), vals)
        # re-stamp L1A once valid location data exists (echodata.py:348)
        from ..utils.prov import PROCESSING_LEVELS, _valid_latlon

        if _valid_latlon(platform):
            top = self._tree.get("Top-level")
            if top is not None:
                top.attrs["processing_level"] = PROCESSING_LEVELS["L1A"]
                top.attrs["processing_level_url"] = (
                    "https://echopype.readthedocs.io/en/stable/processing-levels.html"
                )
        return self
