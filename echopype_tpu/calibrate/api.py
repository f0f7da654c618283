"""compute_Sv / compute_TS entry points.

Capability parity: echopype/calibrate/api.py:23-449 — CALIBRATOR dispatch by
sonar model, output attrs + provenance + water_level attachment.
"""

from __future__ import annotations

from ..utils.prov import add_processing_level, echopype_prov_attrs, source_files_vars
from ..xrlite import Dataset

__all__ = ["compute_Sv", "compute_TS", "CALIBRATOR"]


def _calibrator_map():
    from .azfp import CalibrateAZFP
    from .ek import CalibrateEK60
    from .ek80 import CalibrateEK80

    return {
        "EK60": CalibrateEK60,
        "ES70": CalibrateEK60,
        "EK80": CalibrateEK80,
        "ES80": CalibrateEK80,
        "EA640": CalibrateEK80,
        "AZFP": CalibrateAZFP,
        "AZFP6": CalibrateAZFP,
    }


CALIBRATOR = _calibrator_map  # resolved lazily to avoid import cycles


def _compute_cal(
    cal_type,
    echodata,
    env_params=None,
    cal_params=None,
    ecs_file=None,
    waveform_mode=None,
    encode_mode=None,
    **kwargs,
) -> Dataset:
    model = echodata.sonar_model
    cal_map = _calibrator_map()
    if model not in cal_map:
        raise ValueError(f"Unsupported sonar model for calibration: {model}")

    # EK80-style waveform/encode validation (echodata/simrad.py:12)
    if model in ("EK80", "ES80", "EA640"):
        from ..echodata.simrad import check_input_args_combination

        waveform_mode, encode_mode = check_input_args_combination(waveform_mode, encode_mode)
    elif model in ("EK60", "ES70"):
        if waveform_mode is not None and waveform_mode != "CW":
            raise ValueError("EK60-style data can only be calibrated with waveform_mode='CW'")
        if encode_mode is not None and encode_mode != "power":
            raise ValueError("EK60-style data can only be calibrated with encode_mode='power'")

    cal_obj = cal_map[model](
        echodata,
        env_params=env_params,
        cal_params=cal_params,
        ecs_file=ecs_file,
        waveform_mode=waveform_mode,
        encode_mode=encode_mode,
        **kwargs,
    )
    cal_ds = getattr(cal_obj, f"compute_{cal_type}")()

    # attrs
    cal_ds.coords["range_sample"].attrs = {"long_name": "Along-range sample number, base 0"}
    cal_ds.data_vars[cal_type].attrs.update(
        {
            "long_name": {
                "Sv": "Volume backscattering strength (Sv re 1 m-1)",
                "TS": "Target strength (TS re 1 m^2)",
            }[cal_type],
            "units": "dB",
        }
    )
    cal_ds.data_vars["echo_range"].attrs.update({"long_name": "Range distance", "units": "m"})
    if model in ("EK80", "ES80", "EA640"):
        cal_ds.data_vars[cal_type].attrs.update(
            {"waveform_mode": waveform_mode, "encode_mode": encode_mode}
        )

    # provenance
    source_file = echodata.source_file or echodata.converted_raw_path or "SOURCE FILE NOT IDENTIFIED"
    prov = echopype_prov_attrs(process_type="processing")
    prov["processing_function"] = f"calibrate.compute_{cal_type}"
    cal_ds.attrs.update(prov)
    for name, da in source_files_vars(source_file).items():
        cal_ds[name] = da

    # water level
    plat = echodata.get("Platform")
    if plat is not None and "water_level" in plat.data_vars:
        cal_ds["water_level"] = plat["water_level"]

    return cal_ds


@add_processing_level("L2A")
def compute_Sv(echodata, **kwargs) -> Dataset:
    """Compute volume backscattering strength Sv from raw data.

    Parameters mirror the reference (calibrate/api.py:249): ``env_params``,
    ``cal_params``, ``ecs_file``, and for EK80 ``waveform_mode`` {"CW","BB","FM"}
    and ``encode_mode`` {"complex","power"}.
    """
    return _compute_cal("Sv", echodata, **kwargs)


@add_processing_level("L2A")
def compute_TS(echodata, **kwargs) -> Dataset:
    """Compute target strength TS from raw data (calibrate/api.py:348)."""
    return _compute_cal("TS", echodata, **kwargs)
