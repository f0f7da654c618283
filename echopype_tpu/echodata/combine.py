"""combine_echodata: concatenate converted files along their append dims.

Capability parity: echopype/echodata/combine.py:860 (fuller implementation
lands with the multi-file ingest milestone).
"""

from ..xrlite import concat
from .echodata import EchoData

APPEND_DIMS = {"filenames", "time1", "time2", "time3", "time4", "nmea_time", "ping_time", "filter_time"}


def combine_echodata(echodata_list, channel_selection=None) -> EchoData:
    raise NotImplementedError("combine_echodata lands with the multi-file ingest milestone")
