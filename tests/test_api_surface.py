"""The public API surface contract (SURVEY.md Appendix A).

A user of the reference must find every entry point here with the same
names and keyword parameters — this test pins that contract so a refactor
can't silently drop any of it.
"""

import inspect

import echopype_tpu as ep
from echopype_tpu.echodata.echodata import EchoData

TOP_LEVEL = {
    "open_raw": [
        "raw_file", "sonar_model", "xml_path", "include_bot", "include_idx",
        "convert_params", "storage_options", "use_swap", "max_chunk_size",
    ],
    "open_converted": ["converted_raw_path", "storage_options"],
    "combine_echodata": ["echodata_list", "channel_selection"],
    "verbose": ["logfile", "override"],
}

SUBPACKAGES = {
    "calibrate": ["compute_Sv", "compute_TS"],
    "clean": [
        "estimate_background_noise", "remove_background_noise",
        "mask_transient_noise", "mask_impulse_noise", "mask_attenuated_signal",
        "detect_transient",
    ],
    "mask": [
        "frequency_differencing", "apply_mask", "regrid_mask",
        "detect_seafloor", "detect_shoal",
    ],
    "commongrid": ["compute_MVBS", "compute_MVBS_index_binning", "compute_NASC"],
    "consolidate": [
        "swap_dims_channel_frequency", "add_depth", "add_location",
        "add_splitbeam_angle",
    ],
    "metrics": ["abundance", "center_of_mass", "dispersion", "evenness", "aggregation"],
    "qc": ["coerce_increasing_time", "exist_reversed_time"],
}

CALIBRATE_KW = [
    "echodata", "env_params", "cal_params", "ecs_file", "waveform_mode",
    "encode_mode",
]

ECHODATA_SURFACE = [
    "to_netcdf", "to_zarr", "update_platform", "chunk", "cleanup_swap_files",
    "nbytes", "group_paths", "version_info", "from_file",
]


def test_top_level_signatures():
    for name, params in TOP_LEVEL.items():
        fn = getattr(ep, name)
        sig = set(inspect.signature(fn).parameters)
        missing = [p for p in params if p not in sig]
        assert not missing, f"{name} missing params {missing}"


def test_subpackage_functions():
    for mod_name, fns in SUBPACKAGES.items():
        mod = getattr(ep, mod_name)
        missing = [f for f in fns if not hasattr(mod, f)]
        assert not missing, f"{mod_name} missing {missing}"


def test_compute_sv_keywords():
    sig = set(inspect.signature(ep.calibrate.compute_Sv).parameters)
    missing = [p for p in CALIBRATE_KW if p not in sig]
    assert not missing, missing


def test_echodata_surface():
    missing = [a for a in ECHODATA_SURFACE if not hasattr(EchoData, a)]
    assert not missing, missing


def test_utils_surface():
    assert hasattr(ep.utils.uwa, "calc_sound_speed")
    assert hasattr(ep.utils.uwa, "calc_absorption")
    assert hasattr(ep.utils.misc, "depth_from_pressure")
    assert hasattr(ep.utils.misc, "camelcase2snakecase")
    assert hasattr(ep.utils.align, "align_to_ping_time")
