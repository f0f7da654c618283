from .mesh import make_mesh
from .pipeline import (
    sharded_mvbs_step_closed,
    sharded_sv_mvbs_step,
    survey_pipeline_step,
    sv_mvbs_core,
    sv_mvbs_core_mxu,
    sv_mvbs_core_mxu_closed,
)
from .survey import run_survey_mvbs, run_survey_mvbs_from_raw

__all__ = [
    "make_mesh",
    "sharded_sv_mvbs_step",
    "sharded_mvbs_step_closed",
    "sv_mvbs_core_mxu_closed",
    "survey_pipeline_step",
    "sv_mvbs_core",
    "sv_mvbs_core_mxu",
    "run_survey_mvbs",
    "run_survey_mvbs_from_raw",
]
