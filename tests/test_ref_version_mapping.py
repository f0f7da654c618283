"""The reference's sensor_ep_version_mapping package executes on the facade
as the oracle for our ``echodata/sensor_ep_version_mapping.py``.

Behavioral contract: echopype/echodata/sensor_ep_version_mapping/
(ep_version_mapper.py:6-30 + v05x_to_v06x.py:15-1156).  The reference's own
tests for this module are permanently xfailed (tests/echodata/
test_echodata_version_convert.py:1-10 — kept "in case"), so executing the
real migration code is the only ground truth available.

Accessor-era note: the migration mutates datasets THROUGH ``ed[grp]`` —
``ed[grp]["var"] = ...`` and ``ed[grp].var.attrs[...] = ...`` — which only
works under the v0.6-era datatree accessor where ``ed[grp]`` returned the
node's mutable dataset.  The reference's MODERN ``EchoData.__getitem__``
(echodata.py:315-335) returns a fresh ``sanitize_dtypes(node.to_dataset())``
copy, under which the dead-code migration would silently drop every inserted
variable.  The oracle therefore runs the reference functions verbatim on a
thin shim reproducing the v0.6-era accessor (mutable node ds), which is the
semantics the module was written — and last shipped — against.

v0.5 input trees are fabricated per sensor to cover every branch the
migration reads: EK60 (one beam group, one-way beamwidth renames, water_level
on ping_time, combined-file src_filenames variable quirk), EK80 (two beam
groups, quadrant dim, config_xml channel-id recovery, scalar water_level +
drop_keel_offset attr, one-row Environment), AZFP (tilt/counts moves,
sample_interval ping_time expansion, serial-number channel ids), and AD2CP
(Vendor rename only).
"""

import numpy as np
import pytest

from echopype_tpu.echodata import EchoData
from echopype_tpu.echodata.sensor_ep_version_mapping import map_ep_version
from echopype_tpu.utils.prov import ECHOPYPE_TPU_VERSION
from echopype_tpu.xrlite import Dataset
from echopype_tpu.xrlite.datatree import DataTree

from ref_oracle import load_ref_version_mapping
from test_ref_echodata import _assert_attrs_equal, _assert_ds_equal


# ---------------------------------------------------------------------------
# v0.6-era accessor shim (see module docstring)
# ---------------------------------------------------------------------------


class _RefEchoDataShim:
    """Reference EchoData surface as the migration uses it: ``_tree`` (a
    DataTree whose ``__setitem__`` re-parents nodes and whose nodes expose
    ``.children``/``.ds``/``.orphan()``), ``group_paths``
    (echodata.py:311-312), mutable ``__getitem__``, and ``version_info``
    (echodata.py:283-304)."""

    def __init__(self, groups: dict):
        self._tree = DataTree.from_dict(
            {("/" if k == "Top-level" else k): v for k, v in groups.items()}
        )

    @property
    def group_paths(self):
        return tuple(p[1:] if p != "/" else "Top-level" for p in self._tree.groups)

    def _node(self, key):
        return self._tree if key in ("Top-level", "/") else self._tree[key]

    def __getitem__(self, key):
        return self._node(key).ds

    def __setitem__(self, key, value):
        self._node(key).dataset = value

    @property
    def version_info(self):
        prov = self["Provenance"]

        def _tuple(ptype):
            v = prov.attrs.get(f"{ptype}_software_version")
            if v is None:
                return None
            return tuple(int(i) for i in str(v).lstrip("v").split(".")[:3])

        if prov.attrs.get("combination_software_name") == "echopype":
            return _tuple("combination")
        if prov.attrs.get("conversion_software_name") == "echopype":
            return _tuple("conversion")
        return None


# ---------------------------------------------------------------------------
# v0.5.x tree fabricators (fresh arrays per call: each side gets its own copy)
# ---------------------------------------------------------------------------


def _times(n, start="2021-03-01T10:00:00", step_s=1):
    t0 = np.datetime64(start, "ns")
    return t0 + np.arange(n) * np.timedelta64(step_s, "s")


def _rng(seed):
    return np.random.default_rng(seed)


def _prov(combined=False):
    attrs = {
        "conversion_software_name": "echopype",
        "conversion_software_version": "0.5.6",
        "conversion_time": "2021-03-01T12:00:00Z",
    }
    if combined:
        ds = Dataset(
            {"src_filenames": (("filenames",), np.array(["a.raw", "b.raw"], dtype=object))},
            coords={"filenames": np.arange(2)},
            attrs=attrs,
        )
    else:
        ds = Dataset(attrs={**attrs, "src_filenames": "survey-D20210301.raw"})
    return ds


def _v05_ek60(combined=False):
    r = _rng(60)
    freq = np.array([18000.0, 38000.0])
    pt, lt, rb = _times(3), _times(4, step_s=2), np.arange(5)
    ch_ids = np.array(
        ["GPT  18 kHz 009072034d45 1-1 ES18-11", "GPT  38 kHz 009072033fa2 2-1 ES38B"],
        dtype=object,
    )

    def fvar(vals, attrs=None):
        return (("frequency",), np.asarray(vals, dtype="f8"), attrs or {})

    beam = Dataset(
        {
            "channel_id": (("frequency",), ch_ids),
            "backscatter_r": (("frequency", "ping_time", "range_bin"), r.normal(size=(2, 3, 5))),
            "beamwidth_receive_alongship": fvar([10.9, 7.1], {"long_name": "Half power one-way receive beam width along alongship axis of beam", "units": "arc_degree"}),
            "beamwidth_transmit_athwartship": fvar([10.8, 7.0], {"long_name": "Half power one-way transmit beam width along athwartship axis of beam", "units": "arc_degree"}),
            "beamwidth_receive_athwartship": fvar([10.7, 6.9], {"units": "arc_degree"}),
            "beamwidth_transmit_alongship": fvar([10.6, 6.8], {"units": "arc_degree"}),
            "angle_sensitivity_alongship": fvar([13.9, 21.9]),
            "angle_sensitivity_athwartship": fvar([13.8, 21.8]),
            "angle_offset_alongship": fvar([0.1, -0.05]),
            "angle_offset_athwartship": fvar([0.2, -0.1]),
            "angle_alongship": (("frequency", "ping_time", "range_bin"), r.normal(size=(2, 3, 5))),
            "angle_athwartship": (("frequency", "ping_time", "range_bin"), r.normal(size=(2, 3, 5))),
            "transducer_offset_x": fvar([1.0, 1.5]),
            "transducer_offset_y": fvar([0.0, 0.2]),
            "transducer_offset_z": fvar([6.0, 6.1]),
            "sample_interval": (("frequency", "ping_time"), np.full((2, 3), 2.56e-4)),
        },
        coords={"frequency": freq, "ping_time": pt, "range_bin": rb},
        attrs={"beam_mode": "vertical", "conversion_equation_t": "type_3"},
    )
    env = Dataset(
        {
            "absorption_indicative": (("frequency", "ping_time"), np.tile([[0.0026], [0.0095]], 3)),
            "sound_speed_indicative": (("frequency", "ping_time"), np.full((2, 3), 1480.6)),
            "temperature": (("ping_time",), np.array([9.5, 9.6, 9.4])),
        },
        coords={"frequency": freq, "ping_time": pt},
    )
    plat = Dataset(
        {
            "pitch": (("ping_time",), np.array([0.2, 0.1, -0.1]), {"long_name": "Platform pitch", "units": "arc_degree", "valid_range": np.array([-90.0, 90.0])}),
            "roll": (("ping_time",), np.array([1.2, 1.0, 0.8]), {"long_name": "Platform roll", "units": "arc_degree", "valid_range": [-90.0, 90.0]}),
            "heave": (("ping_time",), np.array([0.02, 0.04, -0.01]), {"long_name": "Platform heave", "units": "m", "valid_range": (-10.0, 10.0)}),
            "water_level": (("ping_time",), np.full(3, 9.15), {"long_name": "z-axis distance from the platform coordinate system origin to the sonar transducer", "units": "m"}),
            "latitude": (("location_time",), np.array([45.0, 45.001, 45.002, 45.003]), {"valid_range": [-90.0, 90.0]}),
            "longitude": (("location_time",), np.array([-124.0, -124.001, -124.002, -124.003])),
        },
        coords={"ping_time": pt, "location_time": lt},
        attrs={"platform_code_ICES": "", "platform_name": "", "platform_type": "Research vessel"},
    )
    nmea = Dataset(
        {"NMEA_datagram": (("location_time",), np.array(["$GPGGA,1", "$GPGGA,2", "$GPGGA,3", "$GPGGA,4"], dtype=object))},
        coords={"location_time": lt},
        attrs={"description": "All NMEA sensor datagrams"},
    )
    vend = Dataset(
        {
            "sa_correction": (("frequency", "pulse_length_bin"), r.normal(size=(2, 3))),
            "gain_correction": (("frequency", "pulse_length_bin"), r.normal(size=(2, 3))),
            "pulse_length": (("frequency", "pulse_length_bin"), np.tile([2.56e-4, 5.12e-4, 1.024e-3], (2, 1))),
        },
        coords={"frequency": freq, "pulse_length_bin": np.arange(3)},
    )
    return {
        "Top-level": Dataset(attrs={"keywords": "EK60", "sonar_convention_name": "SONAR-netCDF4"}),
        "Environment": env,
        "Platform": plat,
        "Platform/NMEA": nmea,
        "Provenance": _prov(combined),
        "Sonar": Dataset(attrs={
            "sonar_manufacturer": "Simrad", "sonar_model": "ER60",
            "sonar_serial_number": "", "sonar_software_name": "",
            "sonar_software_version": "2.4.3", "sonar_type": "echosounder",
        }),
        "Beam": beam,
        "Vendor": vend,
    }


_EK80_XML = (
    "<Configuration><Transceivers>"
    '<Transceiver TransceiverName="WBT"><Channels>'
    '<Channel ChannelID="WBT 5512-15 ES70-7C" /></Channels>'
    '<Transducer Frequency="55000" /></Transceiver>'
    '<Transceiver TransceiverName="WBT"><Channels>'
    '<Channel ChannelID="WBT 5513-15 ES120-7C" /></Channels>'
    '<Transducer Frequency="70000" /></Transceiver>'
    '<Transceiver TransceiverName="WBT"><Channels>'
    '<Channel ChannelID="WBT 5514-15 ES200-7C" /></Channels>'
    '<Transducer Frequency="120000" /></Transceiver>'
    "</Transceivers></Configuration>"
)


def _v05_ek80():
    r = _rng(80)
    f_cplx, f_pow = np.array([55000.0, 70000.0]), np.array([120000.0])
    pt, lt, mt, rb = _times(3), _times(2, step_s=3), _times(3, step_s=1), np.arange(4)
    ids = np.array(
        ["WBT 5512-15 ES70-7C", "WBT 5513-15 ES120-7C", "WBT 5514-15 ES200-7C"], dtype=object
    )

    def fvar(freqs, vals, attrs=None):
        return (("frequency",), np.asarray(vals, dtype="f8")[: len(freqs)], attrs or {})

    beam = Dataset(
        {
            "channel_id": (("frequency",), ids[:2]),
            "backscatter_r": (("frequency", "ping_time", "range_bin", "quadrant"), r.normal(size=(2, 3, 4, 4))),
            "backscatter_i": (("frequency", "ping_time", "range_bin", "quadrant"), r.normal(size=(2, 3, 4, 4))),
            "beamwidth_twoway_alongship": fvar(f_cplx, [11.0, 7.2], {"units": "arc_degree"}),
            "beamwidth_twoway_athwartship": fvar(f_cplx, [10.9, 7.1], {"units": "arc_degree"}),
            "angle_sensitivity_alongship": fvar(f_cplx, [14.0, 22.0]),
            "angle_sensitivity_athwartship": fvar(f_cplx, [14.1, 22.1]),
            "angle_offset_alongship": fvar(f_cplx, [0.05, -0.02]),
            "angle_offset_athwartship": fvar(f_cplx, [0.06, -0.03]),
            "transducer_offset_x": fvar(f_cplx, [1.0, 1.1]),
            "transducer_offset_y": fvar(f_cplx, [0.0, 0.1]),
            "transducer_offset_z": fvar(f_cplx, [6.0, 6.2]),
        },
        coords={"frequency": f_cplx, "ping_time": pt, "range_bin": rb, "quadrant": np.arange(4)},
        attrs={"beam_mode": "vertical", "conversion_equation_t": "type_3"},
    )
    beam_power = Dataset(
        {
            "channel_id": (("frequency",), ids[2:]),
            "backscatter_r": (("frequency", "ping_time", "range_bin"), r.normal(size=(1, 3, 4))),
            "angle_alongship": (("frequency", "ping_time", "range_bin"), r.normal(size=(1, 3, 4))),
            "angle_athwartship": (("frequency", "ping_time", "range_bin"), r.normal(size=(1, 3, 4))),
            "beamwidth_twoway_alongship": fvar(f_pow, [6.5], {"units": "arc_degree"}),
            "beamwidth_twoway_athwartship": fvar(f_pow, [6.4], {"units": "arc_degree"}),
            "angle_sensitivity_alongship": fvar(f_pow, [23.0]),
            "angle_sensitivity_athwartship": fvar(f_pow, [23.1]),
            "angle_offset_alongship": fvar(f_pow, [0.01]),
            "angle_offset_athwartship": fvar(f_pow, [0.02]),
            "transducer_offset_x": fvar(f_pow, [1.2]),
            "transducer_offset_y": fvar(f_pow, [0.2]),
            "transducer_offset_z": fvar(f_pow, [6.3]),
        },
        coords={"frequency": f_pow, "ping_time": pt, "range_bin": rb},
        attrs={"beam_mode": "vertical", "conversion_equation_t": "type_3"},
    )
    env = Dataset(
        {
            "temperature": (("ping_time",), np.array([10.1])),
            "salinity": (("ping_time",), np.array([33.2])),
            "sound_speed_indicative": (("ping_time",), np.array([1481.0])),
        },
        coords={"ping_time": _times(1)},
    )
    plat = Dataset(
        {
            "pitch": (("mru_time",), np.array([0.3, 0.2, 0.1])),
            "roll": (("mru_time",), np.array([0.9, 1.0, 1.1])),
            "heave": (("mru_time",), np.array([0.01, 0.02, 0.03])),
            "water_level": ((), np.float64(8.5), {"units": "m"}),
            "latitude": (("location_time",), np.array([44.6, 44.601])),
            "longitude": (("location_time",), np.array([-124.1, -124.101])),
        },
        coords={"mru_time": mt, "location_time": lt},
        attrs={"platform_name": "", "platform_type": "", "drop_keel_offset": 7.5},
    )
    nmea = Dataset(
        {"NMEA_datagram": (("location_time",), np.array(["$GPGLL,1", "$GPGLL,2"], dtype=object))},
        coords={"location_time": lt},
        attrs={"description": "All NMEA sensor datagrams"},
    )
    vend = Dataset(
        {"decimation": (("frequency",), np.array([8.0, 8.0, 6.0]))},
        coords={"frequency": np.array([55000.0, 70000.0, 120000.0])},
        attrs={"config_xml": _EK80_XML},
    )
    sonar = Dataset(
        {"sonar_model": (("frequency",), np.array(["EK80", "EK80", "EK80"], dtype=object))},
        coords={"frequency": np.array([55000.0, 70000.0, 120000.0])},
        attrs={
            "sonar_manufacturer": "Simrad", "sonar_software_name": "EK80",
            "sonar_software_version": "1.12.2", "sonar_type": "echosounder",
        },
    )
    return {
        "Top-level": Dataset(attrs={"keywords": "EK80", "sonar_convention_name": "SONAR-netCDF4"}),
        "Environment": env,
        "Platform": plat,
        "Platform/NMEA": nmea,
        "Provenance": _prov(),
        "Sonar": sonar,
        "Beam": beam,
        "Beam_power": beam_power,
        "Vendor": vend,
    }


def _v05_azfp():
    r = _rng(17)
    freq = np.array([67000.0, 125000.0])
    pt, rb = _times(3), np.arange(6)
    beam = Dataset(
        {
            "backscatter_r": (("frequency", "ping_time", "range_bin"), r.integers(0, 60000, size=(2, 3, 6)).astype("f8")),
            "tilt_x": (("ping_time",), np.array([1.5, 1.6, 1.4])),
            "tilt_y": (("ping_time",), np.array([-0.5, -0.4, -0.6])),
            "cos_tilt_mag": (("ping_time",), np.array([0.999, 0.998, 0.999])),
            "temperature_counts": (("ping_time",), np.array([20500.0, 20520.0, 20480.0])),
            "tilt_x_count": (("ping_time",), np.array([32000.0, 32010.0, 31990.0])),
            "tilt_y_count": (("ping_time",), np.array([33000.0, 33010.0, 32990.0])),
            "DS": (("frequency",), np.array([0.0246, 0.0243])),
            "EL": (("frequency",), np.array([142.0, 140.5])),
            "TVR": (("frequency",), np.array([169.0, 168.0])),
            "VTX": (("frequency",), np.array([94.0, 92.0])),
            "Sv_offset": (("frequency",), np.array([1.1, 0.7])),
            "number_of_samples_digitized_per_pings": (("frequency",), np.array([2046.0, 2046.0])),
            "number_of_digitized_samples_averaged_per_pings": (("frequency",), np.array([1.0, 1.0])),
            "sample_interval": (("frequency",), np.array([2.4e-5, 2.4e-5])),
            "transmit_duration_nominal": (("frequency",), np.array([3.0e-4, 3.0e-4])),
        },
        coords={"frequency": freq, "ping_time": pt, "range_bin": rb},
        attrs={
            "beam_mode": "", "conversion_equation_t": "type_4",
            "tilt_X_a": 0.2, "tilt_X_b": 0.01, "tilt_X_c": -3e-5, "tilt_X_d": 0.0,
            "tilt_Y_a": 0.1, "tilt_Y_b": 0.02, "tilt_Y_c": -2e-5, "tilt_Y_d": 0.0,
            "temperature_ka": 210.0, "temperature_kb": 2.5e3, "temperature_kc": 1e3,
            "temperature_A": 0.001, "temperature_B": 2.5e-4, "temperature_C": 1e-7,
            "number_of_frequency": 2, "number_of_pings_per_burst": 1,
            "average_burst_pings_flag": 0,
        },
    )
    return {
        "Top-level": Dataset(attrs={"keywords": "AZFP", "sonar_convention_name": "SONAR-netCDF4"}),
        "Environment": Dataset(
            {"temperature": (("ping_time",), np.array([8.8, 8.9, 8.7]))},
            coords={"ping_time": pt},
        ),
        "Platform": Dataset(coords={"ping_time": pt}, attrs={"platform_name": "", "platform_type": "subsurface mooring"}),
        "Provenance": _prov(),
        "Sonar": Dataset(attrs={
            "sonar_manufacturer": "ASL Environmental Sciences",
            "sonar_model": "AZFP", "sonar_serial_number": 55030,
            "sonar_software_name": "Based on AZFP Matlab Toolbox",
            "sonar_software_version": "1.4", "sonar_type": "echosounder",
        }),
        "Beam": beam,
        "Vendor": Dataset(
            {"battery_main": (("ping_time",), np.array([13.1, 13.1, 13.0]))},
            coords={"ping_time": pt},
        ),
    }


def _v05_ad2cp():
    pt = _times(3)
    return {
        "Top-level": Dataset(attrs={"keywords": "AD2CP"}),
        "Provenance": _prov(),
        "Sonar": Dataset(attrs={"sonar_manufacturer": "Nortek", "sonar_model": "AD2CP"}),
        "Vendor": Dataset(
            {"data_record_version": (("ping_time",), np.array([3.0, 3.0, 3.0]))},
            coords={"ping_time": pt},
        ),
    }


# ---------------------------------------------------------------------------
# differential driver
# ---------------------------------------------------------------------------


def _run_both(groups_fn):
    ref = load_ref_version_mapping()
    ref_ed = _RefEchoDataShim(groups_fn())
    ref["mapper"].map_ep_version(ref_ed)
    ours = EchoData(tree=groups_fn())
    map_ep_version(ours)
    return ref_ed, ours


def _compare(ref_ed, ours, skip_vars=()):
    """Group-for-group, variable-for-variable, attr-for-attr."""
    assert sorted(ref_ed.group_paths) == sorted(ours.group_paths)
    for path in sorted(ref_ed.group_paths):
        ref_ds, our_ds = ref_ed[path], ours[path]
        drop = [v for g, v in skip_vars if g == path]
        if drop:
            ref_ds = ref_ds.drop_vars(drop)
            our_ds = our_ds.drop_vars(drop)
        _assert_ds_equal(ref_ds, our_ds, path, attrs=True)
        # the migration is largely per-variable attr surgery; _assert_ds_equal
        # compares values + dataset attrs only, so add variable/coord attrs
        for name in list(ref_ds.coords) + list(ref_ds.data_vars):
            ra = ref_ds.coords[name] if name in ref_ds.coords else ref_ds.data_vars[name]
            oa = our_ds.coords[name] if name in our_ds.coords else our_ds.data_vars[name]
            _assert_attrs_equal(ra.attrs, oa.attrs, f"{path}/{name}.attrs")


class TestV05xMigrationDifferential:
    def test_ek60(self):
        ref_ed, ours = _run_both(_v05_ek60)
        _compare(ref_ed, ours)
        # spot-check headline transforms landed
        bg1 = ours["Sonar/Beam_group1"]
        assert "beamwidth_twoway_alongship" in bg1.data_vars
        assert "range_sample" in bg1.coords and "channel" in bg1.coords
        assert "transducer_offset_x" in ours["Platform"].data_vars
        assert ours["Platform"]["pitch"].attrs["valid_range"] == "(-90.0, 90.0)"
        assert "time3" in ours["Platform"].coords
        assert ours["Sonar"].attrs["sonar_model"] == "EK60"
        assert ours["Sonar"].attrs["sonar_software_name"] == "ER60"
        assert "Vendor_specific" in ours.group_paths

    def test_ek60_combined_src_filenames_quirk(self):
        ref_ed, ours = _run_both(lambda: _v05_ek60(combined=True))
        _compare(ref_ed, ours)
        # reference quirk (v05x_to_v06x.py:936): drop_vars result is
        # discarded, so the old variable survives next to the new one
        prov = ours["Provenance"]
        assert "src_filenames" in prov.data_vars and "source_filenames" in prov.data_vars

    def test_ek80(self):
        ref_ed, ours = _run_both(_v05_ek80)
        # beam_group_descr: the reference writes beamgroups_possible[i]
        # ["descr"] VERBATIM (v05x_to_v06x.py:419-428) — a dict for EK80
        # groups 1-2, which can never serialize.  We resolve the dict to the
        # variant the v0.5 layout implies (module docstring); assert both
        # sides explicitly, compare everything else exactly.
        _compare(ref_ed, ours, skip_vars=[("Sonar", "beam_group_descr")])
        ref_descr = ref_ed["Sonar"]["beam_group_descr"].values
        our_descr = ours["Sonar"]["beam_group_descr"].values
        assert isinstance(ref_descr[0], dict) and isinstance(ref_descr[1], dict)
        assert our_descr[0] == ref_descr[0]["complex"]
        assert our_descr[1] == ref_descr[1]["power"]
        # headline transforms
        bg1 = ours["Sonar/Beam_group1"]
        assert "beam" in bg1.dims and list(bg1.coords["beam"].values) == ["1", "2", "3", "4"]
        plat = ours["Platform"]
        assert tuple(plat["water_level"].dims) == ("time3",)
        assert "drop_keel_offset" in plat.data_vars and "drop_keel_offset" not in plat.attrs
        assert "sound_velocity_profile" in ours["Environment"].data_vars
        assert "transducer_name" in ours["Sonar"].data_vars  # renamed sonar_model var

    def test_azfp(self):
        ref_ed, ours = _run_both(_v05_azfp)
        _compare(ref_ed, ours)
        bg1 = ours["Sonar/Beam_group1"]
        assert "cos_tilt_mag" not in bg1.data_vars and "tilt_x" not in bg1.data_vars
        assert tuple(bg1["sample_interval"].dims) == ("channel", "ping_time")
        assert "tilt_x" in ours["Platform"].data_vars
        assert "TVR" in ours["Vendor_specific"].data_vars
        assert "tilt_X_a" in ours["Vendor_specific"].attrs
        assert "tilt_X_a" not in bg1.attrs
        ch = list(ours["Sonar/Beam_group1"].coords["channel"].values)
        assert ch == ["55030-67-1", "55030-125-2"]

    def test_ad2cp_vendor_rename_only(self):
        ref_ed, ours = _run_both(_v05_ad2cp)
        _compare(ref_ed, ours)
        assert "Vendor_specific" in ours.group_paths and "Vendor" not in ours.group_paths
        # nothing else moved
        assert "Sonar" in ours.group_paths and "Provenance" in ours.group_paths


class TestMapEpVersionDispatch:
    """ep_version_mapper.py:6-30 dispatch parity."""

    def _groups(self, version):
        g = _v05_azfp()
        g["Provenance"].attrs["conversion_software_version"] = version
        return g

    def test_v06_passthrough(self):
        ref = load_ref_version_mapping()
        ref_ed = _RefEchoDataShim(self._groups("0.6.3"))
        ref["mapper"].map_ep_version(ref_ed)
        ours = EchoData(tree=self._groups("0.6.3"))
        map_ep_version(ours)
        _compare(ref_ed, ours)
        assert "Vendor" in ours.group_paths  # untouched

    def test_v04_raises_not_implemented(self):
        ref = load_ref_version_mapping()
        with pytest.raises(NotImplementedError) as ref_err:
            ref["mapper"].map_ep_version(_RefEchoDataShim(self._groups("v0.4.1")))
        with pytest.raises(NotImplementedError) as our_err:
            map_ep_version(EchoData(tree=self._groups("v0.4.1")))
        # same message modulo each side's own target-version token
        ref_msg = str(ref_err.value).replace("0.0-ref-oracle", "{V}")
        our_msg = str(our_err.value).replace(ECHOPYPE_TPU_VERSION, "{V}")
        assert ref_msg == our_msg

    def test_own_stores_pass_through(self):
        g = _v05_azfp()
        g["Provenance"].attrs["conversion_software_name"] = "echopype_tpu"
        g["Provenance"].attrs["conversion_software_version"] = ECHOPYPE_TPU_VERSION
        ours = EchoData(tree=g)
        map_ep_version(ours)
        assert "Vendor" in ours.group_paths  # untouched
