"""AZFP calibration: EL - SL + TVG formulas from the operator's manual.

Capability parity: echopype/calibrate/calibrate_azfp.py:10-117 (eq. 2/5/9/10
of GU-100-AZFP-01-R50 Appendix G, incl. the frequency/pulse-length Sv_offset).
"""

from __future__ import annotations

import numpy as np

from ..xrlite import DataArray, Dataset
from .cal_params import get_cal_params_AZFP
from .ek import CalibrateBase
from .env_params import get_env_params_AZFP
from .range import compute_range_AZFP

__all__ = ["CalibrateAZFP"]


class CalibrateAZFP(CalibrateBase):
    def __init__(self, echodata, env_params=None, cal_params=None, ecs_file=None, **kw):
        super().__init__(echodata, env_params, cal_params, ecs_file)
        self.sonar_type = "AZFP"
        if self.ecs_file is not None:
            raise ValueError("Using ECS file for calibration is not currently supported for AZFP!")
        self.env_params = get_env_params_AZFP(echodata=echodata, user_dict=self.env_params)
        self.cal_params = get_cal_params_AZFP(
            beam=echodata["Sonar/Beam_group1"],
            vend=echodata["Vendor_specific"],
            user_dict=self.cal_params,
        )

    def compute_echo_range(self, cal_type):
        self.range_meter = compute_range_AZFP(
            echodata=self.echodata, env_params=self.env_params, cal_type=cal_type
        )

    def _cal_power_samples(self, cal_type, **kw):
        self.compute_echo_range(cal_type=cal_type)
        beam = self.echodata["Sonar/Beam_group1"]

        spreading_loss = 20 * np.log10(self.range_meter)
        absorption_loss = 2 * self.env_params["sound_absorption"] * self.range_meter
        SL = self.cal_params["TVR"] + 20 * np.log10(self.cal_params["VTX0"])  # eq.(2)
        a = self.cal_params["DS"]
        EL = self.cal_params["EL"] - 2.5 / a + beam["backscatter_r"] / (26214 * a)  # eq.(5)

        if cal_type == "Sv":
            out = (
                EL
                - SL
                + spreading_loss
                + absorption_loss
                - 10
                * np.log10(
                    0.5
                    * self.env_params["sound_speed"]
                    * beam["transmit_duration_nominal"]
                    * self.cal_params["equivalent_beam_angle"]
                )
                + self.cal_params["Sv_offset"]
            )  # eq.(9) + p.90-91 offset
            name = "Sv"
        elif cal_type == "TS":
            out = EL - SL + 2 * spreading_loss + absorption_loss  # eq.(10)
            name = "TS"
        else:
            raise ValueError("cal_type not recognized!")

        from ..xrlite import broadcast_arrays

        template = DataArray(
            np.zeros_like(np.asarray(beam["backscatter_r"].values, dtype="f8")),
            beam["backscatter_r"].dims,
        )
        out3, _ = broadcast_arrays(out, template)
        er3, _ = broadcast_arrays(self.range_meter, template)
        out3 = out3.transpose("channel", "ping_time", "range_sample")
        er3 = er3.transpose("channel", "ping_time", "range_sample")
        ds = Dataset(
            coords={
                "channel": beam.coords["channel"],
                "ping_time": beam.coords["ping_time"],
                "range_sample": beam.coords["range_sample"],
            }
        )
        ds[name] = (("channel", "ping_time", "range_sample"), out3.values)
        ds["echo_range"] = (("channel", "ping_time", "range_sample"), er3.values)
        ds["frequency_nominal"] = beam["frequency_nominal"]
        return self._add_params_to_output(ds)

    def compute_Sv(self, **kw):
        return self._cal_power_samples("Sv")

    def compute_TS(self, **kw):
        return self._cal_power_samples("TS")
