"""Dtype and time encodings for storage.

Capability parity: echopype/utils/coding.py — int64-ns time encodings,
per-dtype compression defaults, dtype sanitation.  Compression here is
stdlib zlib (Blosc is not available in this environment); chunking targets
~100MB like the reference (utils/coding.py:179-241).
"""

import numpy as np

DEFAULT_TIME_ENCODING = {
    "units": "nanoseconds since 1970-01-01T00:00:00Z",
    "calendar": "proleptic_gregorian",
    "dtype": "int64",
}

COMPRESSION_SETTINGS = {
    "zarr": {"compressor": {"id": "zlib", "level": 4}},
}


def zarr_compressor_meta(dtype):
    """Reference-default zarr compressor per dtype (utils/coding.py:17-29):
    Blosc zstd-3 bitshuffle for floats, Blosc lz4-5 byteshuffle otherwise —
    falling back to zlib-4 when no libblosc is present."""
    from ..storage import blosc

    if blosc.available():
        if np.dtype(dtype).kind == "f":
            return {
                "id": "blosc", "cname": "zstd", "clevel": 3,
                "shuffle": blosc.BITSHUFFLE, "blocksize": 0,
            }
        return {
            "id": "blosc", "cname": "lz4", "clevel": 5,
            "shuffle": blosc.SHUFFLE, "blocksize": 0,
        }
    return dict(COMPRESSION_SETTINGS["zarr"]["compressor"])

DEFAULT_CHUNK_BYTES = 100 * 1024 * 1024  # 100 MB, matches reference default

TIME_DIMS = ("ping_time", "time1", "time2", "time3", "time4", "nmea_time", "filter_time")


def is_time_array(arr: np.ndarray) -> bool:
    return np.issubdtype(arr.dtype, np.datetime64)


def encode_array(arr: np.ndarray):
    """Return (encoded ndarray, extra attrs) suitable for on-disk storage."""
    if is_time_array(arr):
        return arr.astype("datetime64[ns]").astype("int64"), dict(DEFAULT_TIME_ENCODING)
    if arr.dtype == object:
        # object arrays of strings -> fixed-width unicode
        return arr.astype(str), {}
    return arr, {}


def decode_array(arr: np.ndarray, attrs: dict):
    """Invert encode_array using CF-ish time attrs."""
    units = attrs.get("units", "")
    if isinstance(units, str) and " since " in units and np.issubdtype(arr.dtype, np.integer):
        unit_word = units.split(" since ")[0].strip()
        epoch = units.split(" since ")[1].strip().rstrip("Z")
        np_unit = {
            "nanoseconds": "ns",
            "microseconds": "us",
            "milliseconds": "ms",
            "seconds": "s",
            "minutes": "m",
            "hours": "h",
            "days": "D",
        }.get(unit_word)
        if np_unit is not None:
            base = np.datetime64(epoch.replace(" ", "T"), "ns")
            step = np.timedelta64(1, np_unit).astype("timedelta64[ns]").astype("int64")
            return base + (arr.astype("int64") * step).astype("timedelta64[ns]")
    return arr


def auto_chunks(shape, dtype, target_bytes=None):
    """Pick chunk shape: chunk the leading dim until under target_bytes."""
    if target_bytes is None:
        target_bytes = DEFAULT_CHUNK_BYTES
    itemsize = np.dtype(dtype).itemsize if np.dtype(dtype).itemsize else 8
    total = int(np.prod(shape)) * itemsize
    if not shape or total <= target_bytes:
        return tuple(shape)
    inner = int(np.prod(shape[1:])) * itemsize
    lead = max(1, target_bytes // max(inner, 1))
    return (int(min(lead, shape[0])),) + tuple(shape[1:])


def sanitize_dtypes(arr: np.ndarray) -> np.ndarray:
    """Normalize exotic dtypes for storage (f16->f32, etc.)."""
    if arr.dtype == np.float16:
        return arr.astype(np.float32)
    return arr
