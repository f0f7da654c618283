"""Load reference leaf modules for differential parity testing.

The full reference package can't be imported here (xarray/dask/zarr/flox are
absent), but its *leaf* modules are pure numpy + stdlib and load fine once
small dependency stubs are registered.  This gives the test suite true
reference-executed oracles: our decode/formula outputs are compared against
the reference's own code, not against builder-written expectations.

Loadable leaves (verified):
  - echopype/convert/utils/ek_date_conversion.py   (needs a pytz stub)
  - echopype/convert/utils/ek_raw_parsers.py        (needs log/misc leaves)
  - echopype/utils/uwa.py
  - echopype/utils/compute.py                       (needs a dask stub)
  - echopype/utils/misc.py
  - echopype/calibrate/ecs.py                       (needs an xarray stub)
  - echopype/convert/parse_azfp.py                  (needs zarr/dask.array.core
    stubs + a forced echopype.utils.io stub so the real io.py, which imports
    xarray, is never pulled in by parse_base's relative import)

Since round 3 the "xarray stub" is the full xrlite facade
(echopype_tpu/xrlite/xarray_compat.py), which makes the reference's
xarray-dependent COMPUTE PIPELINE executable as an oracle too:
  - echopype/calibrate/range.py
  - echopype/calibrate/cal_params.py
  - echopype/calibrate/env_params.py
  - echopype/calibrate/calibrate_base.py + calibrate_ek.py (full
    CalibrateEK60/CalibrateEK80 classes, run against a FakeEchoData holding
    our converted groups)
  - echopype/echodata/simrad.py (needs a forced echodata.echodata stub)
  - echopype/utils/align.py
"""

from __future__ import annotations

import datetime
import importlib.util
import sys
import types

import numpy as np

REF_ROOT = "/root/reference/echopype"

_loaded: dict = {}


def _stub(name: str, **attrs) -> None:
    """Register a stub module under `name` if no real one is importable."""
    if name in sys.modules:
        return
    try:
        __import__(name)
        return
    except ImportError:
        pass
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, leaf = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)


def _force_stub(name: str, **attrs) -> None:
    """Register a stub even when a real module WOULD be importable.

    Needed for reference-internal modules (e.g. echopype.utils.io) that the
    package shells make importable but whose real import chain needs xarray.
    """
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    parent, leaf = name.rsplit(".", 1)
    if parent in sys.modules:
        setattr(sys.modules[parent], leaf, mod)


def _package(fullname: str, path: str) -> None:
    """Register an empty package shell so relative imports resolve.

    The shell carries a real spec + SourceFileLoader (never executed) so
    importlib.resources can read package data files (parse_ad2cp loads
    ad2cp_fields.yaml via files(convert)).
    """
    if fullname in sys.modules:
        return
    import importlib.machinery

    mod = types.ModuleType(fullname)
    mod.__path__ = [path]
    mod.__package__ = fullname
    init = f"{path}/__init__.py"
    loader = importlib.machinery.SourceFileLoader(fullname, init)
    spec = importlib.machinery.ModuleSpec(fullname, loader, origin=init, is_package=True)
    spec.submodule_search_locations = [path]
    mod.__spec__ = spec
    sys.modules[fullname] = mod


def _install_stubs() -> None:
    # pandas optionally imports pytz and probes its API; load pandas before
    # the stub exists so it takes its no-pytz path, and alias UTC defensively
    try:
        import pandas  # noqa: F401
    except ImportError:
        pass
    class _PytzUtc(datetime.tzinfo):
        """Just enough of pytz.utc: fixed UTC offset + localize()."""

        def utcoffset(self, dt):
            return datetime.timedelta(0)

        def tzname(self, dt):
            return "UTC"

        def dst(self, dt):
            return datetime.timedelta(0)

        def localize(self, dt):
            return dt.replace(tzinfo=self)

        def normalize(self, dt):
            return dt

    _utc = _PytzUtc()
    _stub("pytz", utc=_utc, UTC=_utc, __version__="2024.1")
    _stub("dask", __version__="2024.1")
    _stub("dask.array", Array=type("Array", (), {}))

    def _parse_bytes(s):
        if isinstance(s, (int, float)):
            return int(s)
        units = {"kb": 1e3, "mb": 1e6, "gb": 1e9, "kib": 2**10, "mib": 2**20,
                 "gib": 2**30, "b": 1}
        t = str(s).strip().lower().replace(" ", "")
        for u in sorted(units, key=len, reverse=True):
            if t.endswith(u):
                return int(float(t[: -len(u)]) * units[u])
        return int(float(t))

    _stub("dask.utils", parse_bytes=_parse_bytes)
    # parse_base.py imports these at module level but the parse_raw() paths we
    # exercise never touch them (swap/rectangularize only).
    def _auto_chunks(chunks, shape, limit=None, dtype=None, **kw):
        """dask.array.core.auto_chunks shim: resolve "auto" chunk requests to
        concrete sizes targeting ``limit`` bytes (coding._get_dask_auto_chunk
        consumes this for the reference's zarr encodings)."""
        itemsize = np.dtype(dtype).itemsize if dtype is not None else 8
        limit_b = _parse_bytes(limit or "100MB")
        out = []
        remaining = max(1, limit_b // max(itemsize, 1))
        for i, (c, s) in enumerate(zip(chunks, shape)):
            if c != "auto":
                out.append(c)
                continue
            inner = 1
            for s2 in shape[i + 1:]:
                inner *= max(1, s2)
            lead = max(1, remaining // inner)
            out.append((int(min(lead, s)),))
        return tuple(out)

    _stub("dask.array.core", auto_chunks=_auto_chunks)
    _stub("zarr", __version__="3.0", Group=type("Group", (), {}))

    class _BloscCodec:
        def __init__(self, cname="zstd", clevel=5, shuffle="shuffle", **kw):
            self.cname, self.clevel, self.shuffle = cname, clevel, shuffle

    _stub("zarr.codecs", BloscCodec=_BloscCodec, BloscShuffle=type("BloscShuffle", (), {"shuffle": "shuffle", "bitshuffle": "bitshuffle", "noshuffle": "noshuffle"}))
    # ek80_complex.py imports three suffix-string constants from
    # set_groups_ek80, whose own import chain needs pynmea2/xarray; stub just
    # the constants (values mirror set_groups_ek80.py:16-18).
    _stub(
        "echopype.convert.set_groups_ek80",
        FILTER_IMAG="coeffs_imag",
        FILTER_REAL="coeffs_real",
        DECIMATION="deci_fac",
    )
    # xarray = the full xrlite facade, so reference compute modules
    # (cal_params/env_params/range/calibrate_ek) execute on xrlite arrays.
    if "xarray" not in sys.modules:
        from echopype_tpu.xrlite import xarray_compat

        sys.modules["xarray"] = xarray_compat.make_module()
    # post-processing module deps (metrics/qc/mask/consolidate run for real)
    _stub("_echopype_version", version="0.0-ref-oracle")

    def _unavailable(*a, **k):
        raise NotImplementedError("not available in the ref-oracle harness")

    # flox + dask_image: real numpy-backed shims (xrlite/flox_compat.py), so
    # the reference's commongrid and clean numerics execute as oracles.
    if "flox" not in sys.modules:
        from echopype_tpu.xrlite import flox_compat

        flox_mod, flox_xr = flox_compat.make_flox_module()
        sys.modules["flox"] = flox_mod
        sys.modules["flox.xarray"] = flox_xr
        di_mod, di_nd = flox_compat.make_dask_image_module()
        sys.modules["dask_image"] = di_mod
        sys.modules["dask_image.ndfilters"] = di_nd
    # geopy.distance shim backed by our WGS-84 geodesic: lets the reference's
    # get_distance_from_latlon / compute_NASC api execute (distance VALUES
    # then come from the same geodesy on both sides; the binning, swap_dims,
    # and assembly remain genuinely differential)
    class _GeoDist:
        def __init__(self, p1, p2):
            from echopype_tpu.utils.geodesy import M_PER_NMI, vincenty_inverse_m

            self._m = float(
                vincenty_inverse_m(
                    np.array([p1[0]]), np.array([p1[1]]),
                    np.array([p2[0]]), np.array([p2[1]]),
                )[0]
            )
            self.nm = self._m / M_PER_NMI

    _stub("geopy", __version__="0")
    _stub("geopy.distance", distance=_GeoDist, geodesic=_GeoDist)

    # pynmea2 shim: GGA/GLL/RMC lat/lon decode (ddmm.mmmm), just enough for
    # set_groups_base._extract_NMEA_latlon (set_groups_base.py:185-220)
    class _NmeaError(Exception):
        pass

    class _NmeaMsg:
        def __init__(self, sentence):
            body = sentence.split("*")[0]
            parts = body.lstrip("$").split(",")
            talker_sentence = parts[0]
            self.sentence_type = talker_sentence[2:] if len(talker_sentence) >= 5 else talker_sentence

            def _latlon(vstr, hemi, width):
                if not vstr:
                    return None
                deg = float(vstr[:width])
                minutes = float(vstr[width:])
                val = deg + minutes / 60.0
                return -val if hemi in ("S", "W") else val

            try:
                if self.sentence_type == "GGA":
                    self.latitude = _latlon(parts[2], parts[3], 2)
                    self.longitude = _latlon(parts[4], parts[5], 3)
                elif self.sentence_type in ("GLL",):
                    self.latitude = _latlon(parts[1], parts[2], 2)
                    self.longitude = _latlon(parts[3], parts[4], 3)
                elif self.sentence_type in ("RMC",):
                    self.latitude = _latlon(parts[3], parts[4], 2)
                    self.longitude = _latlon(parts[5], parts[6], 3)
            except (ValueError, IndexError) as e:
                raise _NmeaError(str(e)) from e
            if getattr(self, "latitude", 1) is None:
                del self.latitude
            if getattr(self, "longitude", 1) is None:
                del self.longitude

    def _nmea_parse(s):
        if not s or not s.startswith("$"):
            raise _NmeaError(f"could not parse {s!r}")
        return _NmeaMsg(s)

    _stub(
        "pynmea2",
        parse=_nmea_parse,
        ChecksumError=_NmeaError,
        SentenceTypeError=_NmeaError,
        ParseError=_NmeaError,
        __version__="0-shim",
    )

    _package("echopype", REF_ROOT)
    _package("echopype.utils", f"{REF_ROOT}/utils")
    _force_stub(
        "echopype.utils.io",
        create_temp_zarr_store=lambda *a, **k: None,
        validate_source=lambda source, storage_options=None: (source, None),
        validate_source_ds_da=lambda source, storage_options=None: (source, None),
        open_source=lambda source, *a, **k: source,
        get_file_format=lambda path: "zarr",
    )
    _package("echopype.convert", f"{REF_ROOT}/convert")
    _package("echopype.convert.utils", f"{REF_ROOT}/convert/utils")
    _package("echopype.calibrate", f"{REF_ROOT}/calibrate")
    _package("echopype.metrics", f"{REF_ROOT}/metrics")
    _package("echopype.qc", f"{REF_ROOT}/qc")
    _package("echopype.mask", f"{REF_ROOT}/mask")
    _package("echopype.mask.seafloor_detection", f"{REF_ROOT}/mask/seafloor_detection")
    _package("echopype.mask.shoal_detection", f"{REF_ROOT}/mask/shoal_detection")
    _package("echopype.consolidate", f"{REF_ROOT}/consolidate")
    _package("echopype.commongrid", f"{REF_ROOT}/commongrid")
    _package("echopype.clean", f"{REF_ROOT}/clean")
    # echodata package shell: EchoData type annotations resolve to `object`;
    # echodata/simrad.py (beam-group selection) loads for real on the facade.
    _package("echopype.echodata", f"{REF_ROOT}/echodata")
    sys.modules["echopype.echodata"].EchoData = object
    _force_stub("echopype.echodata.echodata", EchoData=object)


class FakeEchoData:
    """Duck-typed EchoData for running reference calibrators on our groups.

    The reference CalibrateEK classes only use ``echodata[group_path]`` and
    ``echodata.sonar_model`` (calibrate_ek.py:221-227, 313-318), so a dict of
    xrlite Datasets suffices.
    """

    def __init__(self, groups: dict, sonar_model: str):
        self._groups = dict(groups)
        self.sonar_model = sonar_model

    def __getitem__(self, path):
        return self._groups[path]


def load_ref(relpath: str):
    """Load `echopype/<relpath>.py` from the reference tree, with caching."""
    if relpath in _loaded:
        return _loaded[relpath]
    _install_stubs()
    fullname = "echopype." + relpath.replace("/", ".")
    # a relative import inside another reference module may already have
    # imported this file through the package shell's __path__; reuse that
    # instance instead of executing the file twice (two copies of an enum
    # class break identity-keyed lookups, e.g. parse_ad2cp.DataRecordType)
    existing = sys.modules.get(fullname)
    if existing is not None and getattr(existing, "__file__", None) == f"{REF_ROOT}/{relpath}.py":
        _loaded[relpath] = existing
        return existing
    spec = importlib.util.spec_from_file_location(fullname, f"{REF_ROOT}/{relpath}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    _loaded[relpath] = mod
    return mod


def load_ref_echodata():
    """Load the reference's echodata layer (EchoData, combine, qc, io) for
    differential testing.

    Executes the REAL modules from /root/reference on the xrlite facade:
      - echodata/convention (YAML loader; sonarnetcdf_1 singleton)
      - utils/coding.py (sanitize_dtypes, set_time_encodings, encodings)
      - echodata/utils_platform.py, echodata/echodata.py (EchoData incl.
        update_platform/from_file/to_zarr), echodata/api.py (open_converted)
      - utils/io.py (validate_output_path, sanitize_file_path, save_file)
      - echodata/combine.py (combine_echodata), qc/api.py (orchestrate)

    Returns a dict of the loaded modules keyed by short name.
    """
    if "echodata_layer" in _loaded:
        return _loaded["echodata_layer"]
    _install_stubs()

    # --- extra stubs the echodata layer needs ---------------------------------
    class _GroupNotFoundError(KeyError):
        pass

    _stub("zarr.errors", GroupNotFoundError=_GroupNotFoundError)
    _stub("zarr.storage", LocalStore=type("LocalStore", (), {}))

    def _tree_repr(tree):
        return "\n".join(tree.groups)

    _force_stub("echopype.echodata.widgets", )
    _force_stub("echopype.echodata.widgets.utils", tree_repr=_tree_repr)
    _force_stub(
        "echopype.echodata.widgets.widgets",
        _load_static_files=lambda: ("", ""),
        get_template=lambda name: None,
    )

    # --- convention package: shell + real conv.py + singleton -----------------
    _package("echopype.echodata.convention", f"{REF_ROOT}/echodata/convention")
    conv = load_ref("echodata/convention/conv")
    shell = sys.modules["echopype.echodata.convention"]
    shell._Convention = conv._Convention
    if not hasattr(shell, "sonarnetcdf_1"):
        shell.sonarnetcdf_1 = conv._Convention(version="1.0")

    # --- real coding + utils_platform -----------------------------------------
    coding = load_ref("utils/coding")
    utils_platform = load_ref("echodata/utils_platform")

    # --- real EchoData ---------------------------------------------------------
    # _install_stubs force-stubbed echodata.echodata (EchoData=object) for the
    # simrad.py loads; replace it with the real module
    sys.modules.pop("echopype.echodata.echodata", None)
    _loaded.pop("echodata/echodata", None)
    echodata_mod = load_ref("echodata/echodata")
    sys.modules["echopype.echodata"].EchoData = echodata_mod.EchoData
    sys.modules["echopype.echodata"].echodata = echodata_mod
    api_mod = load_ref("echodata/api")
    sys.modules["echopype.echodata"].api = api_mod

    # --- real utils/io.py (replaces the minimal stub) --------------------------
    sys.modules.pop("echopype.utils.io", None)
    _loaded.pop("utils/io", None)
    io_mod = load_ref("utils/io")
    sys.modules["echopype.utils"].io = io_mod

    # --- combine + qc ----------------------------------------------------------
    combine_mod = load_ref("echodata/combine")
    qc_mod = load_ref("qc/api")

    out = {
        "convention": shell,
        "coding": coding,
        "utils_platform": utils_platform,
        "echodata": echodata_mod,
        "EchoData": echodata_mod.EchoData,
        "api": api_mod,
        "io": io_mod,
        "combine": combine_mod,
        "qc": qc_mod,
    }
    _loaded["echodata_layer"] = out
    return out


def make_ref_echodata(groups: dict, sonar_model: str, source_file: str = None):
    """Build a REAL reference EchoData object from {group_path: Dataset}.

    Keys use our group names ('Top-level', 'Environment', 'Sonar/Beam_group1',
    ...); 'Top-level' maps to the tree root.  The datasets are xrlite facade
    Datasets (e.g. from our conversion pipeline or from reference-executed
    SetGroups).
    """
    layer = load_ref_echodata()
    import xarray as xr

    tree_dict = {}
    for key, ds in groups.items():
        tree_dict["/" if key in ("Top-level", "/") else key] = ds
    tree = xr.DataTree.from_dict(tree_dict, name="root")
    ed = layer["EchoData"](sonar_model=sonar_model, source_file=source_file)
    ed._set_tree(tree)
    ed._load_tree()
    # a non-None converted_raw_path makes the reference's __del__ skip its
    # dask swap-file cleanup (noisy at interpreter shutdown)
    ed.converted_raw_path = source_file or "internal-memory"
    return ed


def load_ref_convert_api():
    """Load the reference's convert/api.py (to_file/open_raw) with the real
    core.py registry — requires swapping the minimal set_groups_ek80
    constants stub for the real module (loadable on the facade)."""
    if "convert_api" in _loaded:
        return _loaded["convert_api"]
    load_ref_echodata()
    # core.py imports every parser + SetGroups class for its registry
    stub = sys.modules.get("echopype.convert.set_groups_ek80")
    if stub is not None and not hasattr(stub, "SetGroupsEK80"):
        sys.modules.pop("echopype.convert.set_groups_ek80", None)
        _loaded.pop("convert/set_groups_ek80", None)
    load_ref("convert/set_groups_base")
    load_ref("convert/set_groups_ek60")
    load_ref("convert/set_groups_ek80")
    load_ref("convert/set_groups_azfp")
    load_ref("convert/set_groups_azfp6")
    load_ref("convert/set_groups_ad2cp")
    load_ref("convert/parse_ek60")
    load_ref("convert/parse_ek80")
    load_ref("convert/parse_azfp")
    load_ref("convert/parse_azfp6")
    load_ref("convert/parse_ad2cp")
    core = load_ref("core")
    sys.modules["echopype"].core = core
    api = load_ref("convert/api")
    _loaded["convert_api"] = api
    return api


def load_ref_version_mapping():
    """Load the reference's sensor_ep_version_mapping package (the v0.5.x ->
    v0.6.x legacy-store migration) for differential testing.

    Requires the real core.py registry because _modify_sonar_group reads
    SONAR_MODELS[sensor]["set_groups"] and calls the SetGroups classes'
    beam_groups_to_convention/_beam_groups_vars unbound
    (v05x_to_v06x.py:416-428).
    """
    if "version_mapping" in _loaded:
        return _loaded["version_mapping"]
    load_ref_convert_api()
    _package(
        "echopype.echodata.sensor_ep_version_mapping",
        f"{REF_ROOT}/echodata/sensor_ep_version_mapping",
    )
    v06 = load_ref("echodata/sensor_ep_version_mapping/v05x_to_v06x")
    mapper = load_ref("echodata/sensor_ep_version_mapping/ep_version_mapper")
    out = {"v05x_to_v06x": v06, "mapper": mapper}
    _loaded["version_mapping"] = out
    return out
