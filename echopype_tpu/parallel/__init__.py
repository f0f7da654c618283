from .mesh import make_mesh
from .pipeline import (
    sharded_binned_partials,
    sharded_mvbs_partials_closed,
    sv_mvbs_window_partials,
    sv_mvbs_window_partials_uniform,
    sharded_mvbs_step_closed,
    sharded_sv_mvbs_step,
    survey_pipeline_step,
    sv_mvbs_core,
    sv_mvbs_core_mxu,
    sv_mvbs_core_mxu_closed,
)
from .survey import run_survey_mvbs, run_survey_mvbs_from_raw, run_survey_nasc

__all__ = [
    "make_mesh",
    "sharded_sv_mvbs_step",
    "sharded_mvbs_step_closed",
    "sharded_mvbs_partials_closed",
    "sharded_binned_partials",
    "sv_mvbs_core_mxu_closed",
    "sv_mvbs_window_partials",
    "sv_mvbs_window_partials_uniform",
    "survey_pipeline_step",
    "sv_mvbs_core",
    "sv_mvbs_core_mxu",
    "run_survey_mvbs",
    "run_survey_mvbs_from_raw",
    "run_survey_nasc",
]
