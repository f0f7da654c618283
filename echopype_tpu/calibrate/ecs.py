"""Echoview ECS calibration-supplement file parsing.

Capability parity: echopype/calibrate/ecs.py:116-475 — regex block parser
with the LocalCal > SourceCal > Fileset hierarchy, Echoview->echopype name
maps, frequency-matched channel conformance, and broadband table assembly.
"""

from __future__ import annotations

import re
from datetime import datetime

import numpy as np

from ..utils.log import _init_logger
from ..xrlite import DataArray, Dataset

logger = _init_logger(__name__)

SEPARATOR = re.compile(r"#=+#\n")
STATUS_CRUDE = re.compile(r"#\s*(?P<status>(.+))\s*#\n")
STATUS_FINE = re.compile(r"#\s+(?P<status>\w+) SETTINGS\s*#\n")
ECS_HEADER = re.compile(
    r"#\s*ECHOVIEW CALIBRATION SUPPLEMENT \(.ECS\) FILE \((?P<data_type>.+)\)\s*#\n"
)
ECS_TIME = re.compile(
    r"#\s+(?P<date>\d{1,2}\/\d{1,2}\/\d{4}) (?P<time>\d{1,2}\:\d{1,2}\:\d{1,2})(.\d+)?\s+#\n"
)
ECS_VERSION = re.compile(r"Version (?P<version>\d+\.\d+)\s*\n")
PARAM_MATCHER = re.compile(
    r"\s*(?P<skip>#?)\s*(?P<param>\w+)\s*=\s*(?P<val>((-?\d+(?:\.\d+)\s*)+|\w+)?)?\s*#?(.*)\n"
)
VAL_PATTERN = r"(-?\d+(?:\.\d+)\s*)\s+"
CAL_HIERARCHY = re.compile(r"(SourceCal|LocalCal) (?P<source>\w+)\s*\n", re.I)

EV_EP_MAP = {
    "EK60": {
        "AbsorptionCoefficient": "sound_absorption",
        "Frequency": "frequency_nominal",
        "MajorAxis3dbBeamAngle": "beamwidth_athwartship",
        "MajorAxisAngleOffset": "angle_offset_athwartship",
        "MajorAxisAngleSensitivity": "angle_sensitivity_athwartship",
        "MinorAxis3dbBeamAngle": "beamwidth_alongship",
        "MinorAxisAngleOffset": "angle_offset_alongship",
        "MinorAxisAngleSensitivity": "angle_sensitivity_alongship",
        "PulseDuration": "transmit_duration_nominal",
        "SaCorrectionFactor": "sa_correction",
        "SoundSpeed": "sound_speed",
        "EK60SaCorrection": "sa_correction",
        "TransducerGain": "gain_correction",
        "Ek60TransducerGain": "gain_correction",
        "TransmittedPower": "transmit_power",
        "TwoWayBeamAngle": "equivalent_beam_angle",
    },
    "EK80": {
        "AbsorptionDepth": "pressure",
        "Acidity": "pH",
        "EffectivePulseDuration": "tau_effective",
        "Salinity": "salinity",
        "SamplingFrequency": "sampling_frequency",
        "Temperature": "temperature",
        "TransceiverImpedance": "impedance_transceiver",
        "TransceiverSamplingFrequency": "receiver_sampling_frequency",
        "FrequencyTableWideband": "frequency_BB",
        "GainTableWideband": "gain_correction",
        "MajorAxisAngleOffsetTableWideband": "angle_offset_athwartship",
        "MajorAxisBeamWidthTableWideband": "beamwidth_athwartship",
        "MinorAxisAngleOffsetTableWideband": "angle_offset_alongship",
        "MinorAxisBeamWidthTableWideband": "beamwidth_alongship",
        "NumberOfTransducerSegments": "n_sector",
        "PulseCompressedEffectivePulseDuration": "tau_effective_pc",
    },
}
ENV_PARAMS = [
    "AbsorptionCoefficient",
    "SoundSpeed",
    "AbsorptionDepth",
    "Acidity",
    "Salinity",
    "Temperature",
]
CAL_PARAMS_BB = (
    "FrequencyTableWideband",
    "GainTableWideband",
    "MajorAxisAngleOffsetTableWideband",
    "MajorAxisBeamWidthTableWideband",
    "MinorAxisAngleOffsetTableWideband",
    "MinorAxisBeamWidthTableWideband",
)

__all__ = ["ECSParser", "ecs_ev2ep", "ecs_ds2dict", "conform_channel_order", "ecs_to_params"]


class ECSParser:
    """Parser for Echoview calibration supplement (.ecs) files."""

    TvgRangeCorrection_allowed_str = (
        "None",
        "BySamples",
        "SimradEx500",
        "SimradEx60",
        "BioSonics",
        "Kaijo",
        "PulseLength",
        "Ex500Forced",
        "SimradEK80",
        "Standard",
    )

    def __init__(self, input_file=None):
        self.input_file = input_file
        self.data_type = None
        self.version = None
        self.file_creation_time = None
        self.parsed_params = None

    def _parse_header(self, fid) -> bool:
        tmp = ECS_TIME.match(fid.readline())
        if tmp:
            self.file_creation_time = datetime.strptime(
                tmp["date"] + " " + tmp["time"], "%m/%d/%Y %H:%M:%S"
            )
        if SEPARATOR.match(fid.readline()) is None:
            raise ValueError("Unexpected line in ECS file!")
        for _ in range(6):
            fid.readline()
        if SEPARATOR.match(fid.readline()) is None:
            raise ValueError("Unexpected line in ECS file!")
        line = "\n"
        while line == "\n":
            line = fid.readline()
        m = ECS_VERSION.match(line)
        if m:
            self.version = m["version"]
        return True

    def _parse_block(self, fid, status) -> dict:
        param_val = {}
        if SEPARATOR.match(fid.readline()) is None:
            raise ValueError("Unexpected line in ECS file!")
        source = None
        while True:
            curr_pos = fid.tell()
            line = fid.readline()
            if SEPARATOR.match(line) is not None:
                fid.seek(curr_pos)
                break
            if line == "":
                break
            if status == "fileset" and source is None:
                source = "fileset"
                param_val[source] = {}
            if status in line.lower() and status != "fileset":
                source = CAL_HIERARCHY.match(line)["source"]
                param_val[source] = {}
            elif line != "\n" and source is not None:
                tmp = PARAM_MATCHER.match(line)
                if tmp and (tmp["skip"] == "" or tmp["param"] == "Frequency"):
                    param_val[source][tmp["param"]] = tmp["val"]
        return param_val

    def _convert_param_type(self):
        def convert_type(d):
            for k, v in d.items():
                if k == "TvgRangeCorrection":
                    if v not in self.TvgRangeCorrection_allowed_str:
                        raise ValueError("TvgRangeCorrection contains unexpected setting!")
                elif k == "TransducerModeActive":
                    d[k] = bool(v)
                else:
                    vals = re.findall(VAL_PATTERN, v)
                    d[k] = np.array(vals).astype(float) if len(vals) > 1 else float(v)

        for status, settings in self.parsed_params.items():
            if status == "fileset":
                convert_type(settings)
            else:
                for src_v in settings.values():
                    convert_type(src_v)

    def parse(self):
        with open(self.input_file, encoding="utf-8-sig") as fid:
            line = fid.readline()
            parsed_params = {}
            status = None
            while line != "":
                if line != "\n":
                    if SEPARATOR.match(line) is not None:
                        if status is not None:
                            status = None
                    elif status is None:
                        status_str = STATUS_CRUDE.match(line)["status"].lower()
                        if "ecs" in status_str:
                            status = "ecs"
                            self.data_type = ECS_HEADER.match(line)["data_type"]
                            self._parse_header(fid)
                        elif any(s in status_str for s in ("fileset", "sourcecal", "localcal")):
                            status = STATUS_FINE.match(line)["status"].lower()
                            parsed_params[status] = self._parse_block(fid, status)
                        else:
                            raise ValueError("Expecting a new block but got something else!")
                line = fid.readline()
        parsed_params["fileset"] = parsed_params.get("fileset", {}).get("fileset", {})
        parsed_params.setdefault("sourcecal", {})
        parsed_params.setdefault("localcal", {})
        self.parsed_params = parsed_params
        self._convert_param_type()

    def get_cal_params(self, localcal_name=None) -> dict:
        """Consolidate with the LocalCal > SourceCal > Fileset hierarchy."""
        sources = self.parsed_params["sourcecal"].keys()
        ev_cal_params = {}
        for src in sources:
            ev_cal_params[src] = self.parsed_params["fileset"].copy()
            ev_cal_params[src].update(self.parsed_params["sourcecal"][src])
        if self.parsed_params["localcal"]:
            if localcal_name is None:
                localcal_name = next(iter(self.parsed_params["localcal"]))
            for k, v in self.parsed_params["localcal"][localcal_name].items():
                for src in sources:
                    ev_cal_params[src][k] = v
        return ev_cal_params


def ecs_ev2ep(ev_dict, sonar_type):
    """Consolidated ECS dict -> (env Dataset, cal Dataset, BB cal Dataset|None)."""
    PARAM_MAP = dict(EV_EP_MAP["EK60"])
    if sonar_type == "EK80":
        PARAM_MAP.update(EV_EP_MAP["EK80"])
    cal_names = set(PARAM_MAP) - set(ENV_PARAMS) - set(CAL_PARAMS_BB)

    def get_param_ds(param_type):
        ds = Dataset(coords={"channel": np.arange(len(ev_dict))})
        for p_name in param_type:
            vals = [src.get(p_name, np.nan) for src in ev_dict.values()]
            if any(not (np.isscalar(v) and np.isnan(v)) for v in vals):
                try:
                    arr = np.asarray(vals, dtype="f8")
                except (TypeError, ValueError):
                    continue
                if not np.isnan(arr).all():
                    ds[PARAM_MAP[p_name]] = (("channel",), arr)
        return ds

    ds_env = get_param_ds(ENV_PARAMS)
    ds_cal = get_param_ds(sorted(cal_names))
    if "frequency_nominal" in ds_cal:
        ds_env["frequency_nominal"] = ds_cal["frequency_nominal"]

    # frequency-dependent BB tables
    bb_sources = [
        (src, d) for src, d in ev_dict.items() if "FrequencyTableWideband" in d
    ]
    ds_cal_BB = None
    if bb_sources:
        freqs = sorted(
            set(np.concatenate([np.atleast_1d(d["FrequencyTableWideband"]) for _, d in bb_sources]))
        )
        freqs = np.asarray(freqs, dtype="f8")
        ds_cal_BB = Dataset(
            coords={
                "cal_frequency": (
                    ("cal_frequency",),
                    freqs * 1000,
                    {"long_name": "Frequency of calibration parameter", "units": "Hz"},
                ),
                "cal_channel_id": np.asarray(
                    [str(d["Frequency"]) for _, d in bb_sources], dtype=object
                ),
            }
        )
        for p_name in CAL_PARAMS_BB[1:]:
            vals = np.full((len(bb_sources), len(freqs)), np.nan)
            found = False
            for i, (_, d) in enumerate(bb_sources):
                if p_name in d:
                    found = True
                    idx = np.searchsorted(freqs, np.atleast_1d(d["FrequencyTableWideband"]))
                    vals[i, idx] = np.atleast_1d(d[p_name])
            if found:
                ds_cal_BB[PARAM_MAP[p_name]] = (("cal_channel_id", "cal_frequency"), vals)
        ds_cal_BB["frequency_nominal"] = (
            ("cal_channel_id",),
            np.asarray([d["Frequency"] for _, d in bb_sources], dtype="f8") * 1000,
        )

    # kHz -> Hz
    for p_name in ("frequency_nominal", "sampling_frequency", "receiver_sampling_frequency"):
        for ds in (ds_env, ds_cal):
            if p_name in ds:
                ds[p_name] = (("channel",), np.asarray(ds[p_name].values) * 1000)
    return ds_env, ds_cal, ds_cal_BB


def ecs_ds2dict(ds) -> dict:
    if ds is None:
        return {}
    return {name: ds[name] for name in ds.data_vars}


def conform_channel_order(ds_in, freq_ref):
    """Reorder ECS channels to match the data's channel order by frequency."""
    if ds_in is None:
        return None
    if not isinstance(freq_ref, DataArray):
        raise ValueError("'freq_ref' has to be a DataArray!")
    if "channel" not in freq_ref.coords:
        raise ValueError("'channel' has to be a coordinate of 'freq_ref'!")
    if "frequency_nominal" not in ds_in:
        return None
    ecs_freqs = np.asarray(ds_in["frequency_nominal"].values, dtype="f8")
    ref_freqs = np.asarray(freq_ref.values, dtype="f8")
    overlap = [f for f in ref_freqs if f in set(ecs_freqs)]
    if not overlap:
        return None
    sel_idx = [int(np.nonzero(ecs_freqs == f)[0][0]) for f in overlap]
    ref_idx = [int(np.nonzero(ref_freqs == f)[0][0]) for f in overlap]
    out = Dataset()
    out.coords["channel"] = DataArray(
        np.asarray(freq_ref.coords["channel"].values)[ref_idx], ("channel",), name="channel"
    )
    for name, var in ds_in.data_vars.items():
        if name == "frequency_nominal":
            continue
        if "channel" in var.dims:
            out[name] = (("channel",), np.asarray(var.values)[sel_idx])
        else:
            out[name] = var
    return out


def ecs_to_params(ecs_file, sonar_type, frequency_nominal):
    """Parse an ECS file into (env_params, cal_params) dicts for a calibrator."""
    parser = ECSParser(ecs_file)
    parser.parse()
    ev_dict = parser.get_cal_params()
    ds_env, ds_cal, ds_cal_BB = ecs_ev2ep(ev_dict, sonar_type)
    env = ecs_ds2dict(conform_channel_order(ds_env, frequency_nominal))
    cal = ecs_ds2dict(conform_channel_order(ds_cal, frequency_nominal))
    # strip params that are not calibration inputs
    cal.pop("transmit_duration_nominal", None)
    cal.pop("transmit_power", None)
    cal.pop("tau_effective", None)
    return env, cal
