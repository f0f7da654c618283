"""AD2CP group assembly: up to 4 beam groups by acquisition mode.

Capability parity: echopype/convert/set_groups_ad2cp.py:29-2138 — beam groups
for Average / Burst / Echosounder / Echosounder-raw modes, env (sound speed,
temperature, pressure) and platform (heading/pitch/roll) on ping_time, vendor
holds the config string and sensor diagnostics.
"""

from __future__ import annotations

import numpy as np

from ..xrlite import DataArray, Dataset
from .set_groups_base import SetGroupsBase

BEAM_GROUP_DESCR = {
    "average": (
        "contains echo intensity, velocity and correlation data as well as other "
        "configuration parameters from the Average mode."
    ),
    "burst": (
        "contains echo intensity, velocity and correlation data as well as other "
        "configuration parameters from the Burst mode."
    ),
    "echosounder": (
        "contains backscatter echo intensity and other configuration parameters "
        "from the Echosounder mode. Data can be pulse compressed or raw intensity."
    ),
    "echosounder_raw": (
        "contains complex backscatter raw samples and other configuration "
        "parameters from the Echosounder mode, including complex data from the "
        "transmit pulse."
    ),
}


class SetGroupsAd2cp(SetGroupsBase):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.pulse_compressed = self.parser_obj.get_pulse_compressed()
        self._beamgroups = []

    def _packets(self, pred):
        return [p for p in self.parser_obj.packets if pred(p) and p.has_timestamp()]

    def _times(self, pkts):
        return np.asarray([p.timestamp for p in pkts], dtype="datetime64[ns]")

    @staticmethod
    def _dedup_times(pkts, t):
        """Keep the first packet per unique timestamp (average + echosounder
        packets of one ping share a stamp; the reference's time index
        dedupes them)."""
        _, keep = np.unique(t, return_index=True)
        keep = np.sort(keep)
        return [pkts[i] for i in keep], t[keep]

    # ------------------------------------------------------------------- env
    def set_env(self) -> Dataset:
        pkts = self._packets(lambda p: not p.is_string() and "speed_of_sound" in p.data)
        pkts, t = self._dedup_times(pkts, self._times(pkts))
        ds = Dataset(coords={"time1": (("time1",), t, {"axis": "T", "standard_name": "time"})})
        for src, dst in (
            ("speed_of_sound", "sound_speed_indicative"),
            ("temperature", "temperature"),
            ("pressure", "pressure"),
        ):
            ds[dst] = (("time1",), np.asarray([p.data.get(src, np.nan) for p in pkts], dtype="f8"))
        return ds

    # -------------------------------------------------------------- platform
    def set_platform(self) -> Dataset:
        pkts = self._packets(lambda p: "heading" in p.data)
        pkts, t = self._dedup_times(pkts, self._times(pkts))
        ds = Dataset(
            coords={"time2": (("time2",), t, self._varattrs["platform_coord_default"]["time2"])},
            attrs=self._platform_attrs(),
        )
        pv = self._varattrs["platform_var_default"]
        for name in ("heading", "pitch", "roll"):
            attrs = pv.get(name, {"long_name": f"Platform {name}"})
            ds[name] = (
                ("time2",),
                np.asarray([p.data.get(name, np.nan) for p in pkts], dtype="f8"),
                attrs,
            )
        return ds

    # ----------------------------------------------------------------- sonar
    def set_sonar(self) -> Dataset:
        names = [bg["name"] for bg in self._beamgroups]
        descr = [bg["descr"] for bg in self._beamgroups]
        fw = self.parser_obj.get_firmware_version() or {}
        ds = Dataset(
            {
                "beam_group_descr": (
                    ("beam_group",),
                    np.asarray(descr, dtype=object),
                )
            },
            coords={"beam_group": np.asarray(names, dtype=object)},
            attrs={
                "sonar_manufacturer": "Nortek",
                "sonar_model": self.sonar_model,
                "sonar_serial_number": "",
                "sonar_software_name": "",
                "sonar_software_version": str(fw.get("FW", "")),
                "sonar_type": "acoustic Doppler current profiler (ADCP)",
            },
        )
        return ds

    # ------------------------------------------------------------------ beam
    def _mode_dataset(self, pkts, mode):
        """Dataset of [ping_time(, beam, range)] variables for one mode."""
        t = self._times(pkts)
        ds = Dataset(
            coords={
                "ping_time": (
                    ("ping_time",),
                    t,
                    self._varattrs["beam_coord_default"]["ping_time"],
                )
            }
        )

        def scalar_var(src, dst):
            vals = np.asarray([p.data.get(src, np.nan) for p in pkts], dtype="f8")
            if not np.isnan(vals).all():
                ds[dst] = (("ping_time",), vals)

        for src, dst in (
            ("num_beams", "number_of_beams"),
            ("coordinate_system", "coordinate_system"),
            ("num_cells", "number_of_cells"),
            ("blanking", "blanking"),
            ("cell_size", "cell_size"),
            ("echosounder_frequency", "echosounder_frequency"),
            ("velocity_range", "velocity_range"),
            ("ambiguity_velocity", "ambiguity_velocity"),
            ("dataset_description", "data_set_description"),
            ("transmit_energy", "transmit_energy"),
            ("velocity_scaling", "velocity_scaling"),
        ):
            scalar_var(src, dst)

        if mode in ("average", "burst"):
            for src, dst in (
                (f"velocity_data_{mode}", "velocity"),
                (f"amplitude_data_{mode}", "amplitude"),
                (f"correlation_data_{mode}", "correlation"),
            ):
                arrays = [p.data.get(src) for p in pkts]
                if all(a is None for a in arrays):
                    continue
                nb = max(a.shape[0] for a in arrays if a is not None)
                nc = max(a.shape[1] for a in arrays if a is not None)
                out = np.full((len(pkts), nb, nc), np.nan)
                for i, a in enumerate(arrays):
                    if a is not None:
                        out[i, : a.shape[0], : a.shape[1]] = a
                ds.coords.setdefault(
                    "beam", DataArray(np.arange(1, nb + 1).astype(str).astype(object), ("beam",))
                )
                ds.coords.setdefault(
                    "range_sample",
                    DataArray(np.arange(nc), ("range_sample",)),
                )
                ds[dst] = (("ping_time", "beam", "range_sample"), out)
        elif mode == "echosounder":
            arrays = [p.data.get("echosounder_data") for p in pkts]
            if any(a is not None for a in arrays):
                nc = max(len(a) for a in arrays if a is not None)
                out = np.full((len(pkts), nc), np.nan)
                for i, a in enumerate(arrays):
                    if a is not None:
                        out[i, : len(a)] = a
                ds.coords["range_sample"] = DataArray(
                    np.arange(nc), ("range_sample",)
                )
                ds["amplitude"] = (("ping_time", "range_sample"), out)
            ds.coords["echogram"] = DataArray(np.arange(3), ("echogram",))
            pulse_compressed = np.zeros(3)
            if self.pulse_compressed > 0:
                pulse_compressed[self.pulse_compressed - 1] = 1
            ds["pulse_compressed"] = (("echogram",), pulse_compressed)
        elif mode == "echosounder_raw":
            for src, dst in (
                ("echosounder_raw_samples_i", "backscatter_r"),
                ("echosounder_raw_samples_q", "backscatter_i"),
            ):
                arrays = [p.data.get(src) for p in pkts]
                if all(a is None for a in arrays):
                    continue
                nc = max(len(a) for a in arrays if a is not None)
                out = np.full((len(pkts), nc), np.nan)
                for i, a in enumerate(arrays):
                    if a is not None:
                        out[i, : len(a)] = a
                ds.coords.setdefault(
                    "range_sample",
                    DataArray(np.arange(nc), ("range_sample",)),
                )
                ds[dst] = (("ping_time", "range_sample"), out)
            scalar_var("num_complex_samples", "num_complex_samples")
            # transmit-pulse records (id 0x24) ride their own time axis
            # (echopype set_groups_ad2cp: echosounder_raw_transmit_samples_i/q
            #  -> transmit_pulse_r/i)
            tx_pkts = self._packets(lambda p: p.is_echosounder_raw_transmit())
            if tx_pkts:
                ds.coords["ping_time_echosounder_raw_transmit"] = DataArray(
                    self._times(tx_pkts),
                    ("ping_time_echosounder_raw_transmit",),
                    self._varattrs["beam_coord_default"]["ping_time"],
                )
                for src, dst in (
                    ("echosounder_raw_transmit_samples_i", "transmit_pulse_r"),
                    ("echosounder_raw_transmit_samples_q", "transmit_pulse_i"),
                ):
                    arrays = [p.data.get(src) for p in tx_pkts]
                    if all(a is None for a in arrays):
                        continue
                    nc = max(len(a) for a in arrays if a is not None)
                    out = np.full((len(tx_pkts), nc), np.nan)
                    for i, a in enumerate(arrays):
                        if a is not None:
                            out[i, : len(a)] = a
                    ds.coords.setdefault(
                        "transmit_sample",
                        DataArray(np.arange(nc), ("transmit_sample",)),
                    )
                    ds[dst] = (
                        (
                            "ping_time_echosounder_raw_transmit",
                            "transmit_sample",
                        ),
                        out,
                    )
        return ds

    def set_beam(self) -> list:
        groups = []
        self._beamgroups = []
        mode_pred = {
            "average": lambda p: p.is_average(),
            "burst": lambda p: p.is_burst(),
            "echosounder": lambda p: p.is_echosounder(),
            "echosounder_raw": lambda p: p.is_echosounder_raw(),
        }
        for mode, pred in mode_pred.items():
            pkts = self._packets(pred)
            if not pkts:
                continue
            ds = self._mode_dataset(pkts, mode)
            groups.append(ds)
            self._beamgroups.append(
                {"name": f"Beam_group{len(self._beamgroups) + 1}", "descr": BEAM_GROUP_DESCR[mode]}
            )
        return groups

    # ---------------------------------------------------------------- vendor
    VENDOR_FIELDS = (
        ("battery_voltage", "battery_voltage"),
        ("power_level", "power_level"),
        ("temperature_of_pressure_sensor", "temperature_from_pressure_sensor"),
        ("nominal_correlation", "nominal_correlation"),
        ("magnetometer_temperature", "magnetometer_temperature"),
        ("real_time_clock_temperature", "real_time_clock_temperature"),
        ("ensemble_counter", "ensemble_counter"),
    )

    def set_vendor(self) -> Dataset:
        """Vendor diagnostics on ``time1`` = the unique packet timestamps.

        Reference semantics (set_groups_ad2cp.py:72-73,190-192): field rows
        are gathered from EVERY timestamped packet in stream order (missing
        fields pad with 0), then sliced at the FIRST packet index of each
        unique timestamp — one row per unique time, not per packet.
        """
        pkts = [p for p in self.parser_obj.packets if p.has_timestamp()]
        t = self._times(pkts)
        uniq_t, first_idx = np.unique(t, return_index=True)
        ds = Dataset(coords={"time1": (("time1",), uniq_t)})
        for var_name, field in self.VENDOR_FIELDS:
            if not any(field in p.data for p in pkts):
                continue
            vals = np.asarray(
                [p.data.get(field, 0) for p in pkts], dtype="f8"
            )[first_idx]
            ds[var_name] = (("time1",), vals)
        if self.parser_obj.config:
            for heading, kv in self.parser_obj.config.items():
                for k, v in kv.items():
                    ds.attrs[f"{heading}_{k}"] = v
        return ds
