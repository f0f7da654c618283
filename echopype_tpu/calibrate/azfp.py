"""AZFP calibration (lands with the AZFP milestone)."""


class CalibrateAZFP:
    def __init__(self, echodata, **kw):
        raise NotImplementedError("AZFP calibration lands with the AZFP milestone")
