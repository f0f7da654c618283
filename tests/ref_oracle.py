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
"""

from __future__ import annotations

import datetime
import importlib.util
import sys
import types

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
    """Register an empty package shell so relative imports resolve."""
    if fullname in sys.modules:
        return
    mod = types.ModuleType(fullname)
    mod.__path__ = [path]
    mod.__package__ = fullname
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

    _utc = _PytzUtc()
    _stub("pytz", utc=_utc, UTC=_utc, __version__="2024.1")
    _stub("dask", __version__="2024.1")
    _stub("dask.array", Array=type("Array", (), {}))
    # parse_base.py imports these at module level but the parse_raw() paths we
    # exercise never touch them (swap/rectangularize only).
    _stub("dask.array.core", auto_chunks=lambda *a, **k: None)
    _stub("zarr", __version__="3.0", Group=type("Group", (), {}))
    # ek80_complex.py imports three suffix-string constants from
    # set_groups_ek80, whose own import chain needs pynmea2/xarray; stub just
    # the constants (values mirror set_groups_ek80.py:16-18).
    _stub(
        "echopype.convert.set_groups_ek80",
        FILTER_IMAG="coeffs_imag",
        FILTER_REAL="coeffs_real",
        DECIMATION="deci_fac",
    )
    # ecs.py imports xarray at module level but ECSParser itself never touches
    # it; ek80_complex.py additionally CONSTRUCTS DataArrays for its return
    # values, so the stub records data/coords for the tests to unwrap.
    import numpy as _np

    class _StubDataArray:
        def __init__(self, data=None, coords=None, dims=None, name=None, attrs=None):
            self.values = None if data is None else _np.asarray(data)
            self.coords = {} if coords is None else coords
            self.dims = dims
            self.attrs = {} if attrs is None else attrs

    _stub("xarray", DataArray=_StubDataArray, Dataset=type("Dataset", (), {}))
    _package("echopype", REF_ROOT)
    _package("echopype.utils", f"{REF_ROOT}/utils")
    _force_stub("echopype.utils.io", create_temp_zarr_store=lambda *a, **k: None)
    _package("echopype.convert", f"{REF_ROOT}/convert")
    _package("echopype.convert.utils", f"{REF_ROOT}/convert/utils")
    _package("echopype.calibrate", f"{REF_ROOT}/calibrate")


def load_ref(relpath: str):
    """Load `echopype/<relpath>.py` from the reference tree, with caching."""
    if relpath in _loaded:
        return _loaded[relpath]
    _install_stubs()
    fullname = "echopype." + relpath.replace("/", ".")
    spec = importlib.util.spec_from_file_location(fullname, f"{REF_ROOT}/{relpath}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    _loaded[relpath] = mod
    return mod
