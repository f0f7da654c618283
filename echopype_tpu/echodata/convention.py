"""SONAR-netCDF4 v1.0 convention: group map + default variable attributes.

Capability parity: echopype/echodata/convention/1.0.yml (loaded by
convention/conv.py:9).  Kept as a data-driven python dict (no yaml dep).
"""

GROUP_MAP = {
    "top": {"name": "Top-level", "description": "contains metadata about the SONAR file", "ep_group": None},
    "environment": {
        "name": "Environment",
        "description": "contains information relevant to acoustic propagation through water",
        "ep_group": "Environment",
    },
    "platform": {
        "name": "Platform",
        "description": "contains information about the platform on which the sonar is installed",
        "ep_group": "Platform",
    },
    "nmea": {
        "name": "Platform/NMEA",
        "description": "contains information specific to the NMEA protocol",
        "ep_group": "Platform/NMEA",
    },
    "provenance": {
        "name": "Provenance",
        "description": "contains metadata about how the SONAR data were converted",
        "ep_group": "Provenance",
    },
    "sonar": {
        "name": "Sonar",
        "description": "contains sonar system metadata and sonar beam groups",
        "ep_group": "Sonar",
    },
    "beam": {
        "name": "Sonar/Beam_group1",
        "description": "contains backscatter data and other beam or channel-specific data",
        "ep_group": "Sonar/Beam_group1",
    },
    "vendor": {
        "name": "Vendor_specific",
        "description": "contains vendor-specific information about the sonar and the data",
        "ep_group": "Vendor_specific",
    },
}

YAML_FILE_MAP = GROUP_MAP  # alias, mirrors reference naming

#: Default variable attributes (subset of the convention defaults that the
#: processing code and downstream users rely on).
VARATTRS = {
    "beam_coord_default": {
        "channel": {"long_name": "Vendor channel ID"},
        "ping_time": {
            "long_name": "Timestamp of each ping",
            "standard_name": "time",
            "axis": "T",
        },
        "range_sample": {"long_name": "Along-range sample number, base 0"},
        "beam": {"long_name": "Beam name"},
    },
    "beam_var_default": {
        "backscatter_r": {"long_name": "Raw backscatter measurements (real part)"},
        "backscatter_i": {"long_name": "Raw backscatter measurements (imaginary part)"},
        "transmit_frequency_start": {
            "long_name": "Start frequency in transmitted pulse",
            "standard_name": "sound_frequency",
            "units": "Hz",
            "valid_min": 0.0,
        },
        "transmit_frequency_stop": {
            "long_name": "Stop frequency in transmitted pulse",
            "standard_name": "sound_frequency",
            "units": "Hz",
            "valid_min": 0.0,
        },
        "transmit_duration_nominal": {
            "long_name": "Nominal duration of transmitted pulse",
            "units": "s",
            "valid_min": 0.0,
        },
        "transmit_power": {"long_name": "Nominal transmit power", "units": "W", "valid_min": 0.0},
        "sample_interval": {
            "long_name": "Interval between recorded raw data samples",
            "units": "s",
            "valid_min": 0.0,
        },
        "equivalent_beam_angle": {"long_name": "Equivalent beam angle", "units": "sr"},
    },
    "platform_coord_default": {
        "time1": {
            "axis": "T",
            "long_name": "Timestamps for NMEA position datagrams",
            "standard_name": "time",
        },
        "time2": {
            "axis": "T",
            "long_name": "Timestamps for platform motion and orientation data",
            "standard_name": "time",
        },
    },
    "platform_var_default": {
        "latitude": {
            "long_name": "Platform latitude",
            "standard_name": "latitude",
            "units": "degrees_north",
            "valid_range": (-90.0, 90.0),
        },
        "longitude": {
            "long_name": "Platform longitude",
            "standard_name": "longitude",
            "units": "degrees_east",
            "valid_range": (-180.0, 180.0),
        },
        "sentence_type": {"long_name": "NMEA sentence type"},
        "pitch": {
            "long_name": "Platform pitch",
            "standard_name": "platform_pitch_angle",
            "units": "arc_degree",
            "valid_range": (-90.0, 90.0),
        },
        "roll": {
            "long_name": "Platform roll",
            "standard_name": "platform_roll_angle",
            "units": "arc_degree",
            "valid_range": (-90.0, 90.0),
        },
        "vertical_offset": {
            "long_name": "Platform vertical offset from nominal",
            "units": "m",
        },
        "water_level": {
            "long_name": "Distance from the platform coordinate system origin to the nominal water level along the z-axis",  # noqa: E501
            "units": "m",
        },
        "transducer_offset_x": {
            "long_name": "x-axis distance from the platform coordinate system origin to the sonar transducer",  # noqa: E501
            "units": "m",
        },
        "transducer_offset_y": {
            "long_name": "y-axis distance from the platform coordinate system origin to the sonar transducer",  # noqa: E501
            "units": "m",
        },
        "transducer_offset_z": {
            "long_name": "z-axis distance from the platform coordinate system origin to the sonar transducer",  # noqa: E501
            "units": "m",
        },
        "MRU_offset_x": {"long_name": "Motion reference unit offset x", "units": "m"},
        "MRU_offset_y": {"long_name": "Motion reference unit offset y", "units": "m"},
        "MRU_offset_z": {"long_name": "Motion reference unit offset z", "units": "m"},
        "MRU_rotation_x": {"long_name": "MRU rotation x", "units": "arc_degree"},
        "MRU_rotation_y": {"long_name": "MRU rotation y", "units": "arc_degree"},
        "MRU_rotation_z": {"long_name": "MRU rotation z", "units": "arc_degree"},
        "position_offset_x": {"long_name": "Position sensor offset x", "units": "m"},
        "position_offset_y": {"long_name": "Position sensor offset y", "units": "m"},
        "position_offset_z": {"long_name": "Position sensor offset z", "units": "m"},
        "frequency_nominal": {
            "units": "Hz",
            "long_name": "Transducer frequency",
            "valid_min": 0.0,
            "standard_name": "sound_frequency",
        },
    },
}

TOP_LEVEL_ATTRS = {
    "Conventions": "CF-1.7, SONAR-netCDF4-1.0, ACDD-1.3",
    "sonar_convention_authority": "ICES",
    "sonar_convention_name": "SONAR-netCDF4",
    "sonar_convention_version": "1.0",
    "summary": "",
    "title": "",
}
