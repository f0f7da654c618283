"""Location variable selection & validity checks.

Capability parity: echopype/consolidate/loc_utils.py:26-147.
"""

from __future__ import annotations

import numpy as np

from ..utils.log import _init_logger
from ..xrlite import DataArray

logger = _init_logger(__name__)

__all__ = ["sel_nmea", "check_loc_vars_validity"]


def sel_nmea(echodata, loc_name, nmea_sentence=None, datagram_type=None) -> DataArray:
    """Select a location variable, optionally filtered by NMEA sentence type."""
    if nmea_sentence and datagram_type is not None:
        raise ValueError(
            "If datagram_type is not `None`, then `nmea_sentence` cannot be specified."
        )
    plat = echodata["Platform"]
    da = plat[loc_name]
    if nmea_sentence and datagram_type is None:
        sel = np.asarray(plat["sentence_type"].values) == nmea_sentence
        time_dim = da.dims[0]
        return da.isel({time_dim: np.nonzero(sel)[0]})
    return da


def check_loc_vars_validity(echodata, lat_name, lon_name, datagram_type, check: str):
    """Missing / all-NaN raise; some-NaN / some-zero warn (loc_utils.py:26)."""
    plat = echodata["Platform"]
    if check == "missing":
        if lat_name not in plat or lon_name not in plat:
            raise ValueError(
                f"Coordinate variables {lat_name}/{lon_name} not present in the "
                f"Platform group (datagram_type={datagram_type})."
            )
        return
    lat = np.asarray(plat[lat_name].values, dtype="f8")
    lon = np.asarray(plat[lon_name].values, dtype="f8")
    if check == "all_nan":
        if lat.size == 0 or np.all(np.isnan(lat)) or np.all(np.isnan(lon)):
            raise ValueError(
                f"Coordinate variables {lat_name}/{lon_name} are all NaN; "
                "location cannot be added."
            )
    elif check == "some_nan":
        if np.any(np.isnan(lat)) or np.any(np.isnan(lon)):
            logger.warning("Some lat/lon values are NaN; interpolation will skip them.")
    elif check == "some_zero":
        if np.any(lat == 0) or np.any(lon == 0):
            logger.warning("Some lat/lon values are exactly 0; check your position data.")
