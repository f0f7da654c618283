"""EK80 calibration (complex/broadband path lands later this round)."""

from .ek import CalibrateEK


class CalibrateEK80(CalibrateEK):
    def __init__(self, echodata, env_params=None, cal_params=None, ecs_file=None,
                 waveform_mode=None, encode_mode=None, **kw):
        raise NotImplementedError("EK80 calibration lands with the broadband milestone")
