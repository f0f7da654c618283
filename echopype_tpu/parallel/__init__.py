from .mesh import make_mesh
from .pipeline import sharded_sv_mvbs_step, survey_pipeline_step, sv_mvbs_core, sv_mvbs_core_mxu
from .survey import run_survey_mvbs, run_survey_mvbs_from_raw

__all__ = [
    "make_mesh",
    "sharded_sv_mvbs_step",
    "survey_pipeline_step",
    "sv_mvbs_core",
    "sv_mvbs_core_mxu",
    "run_survey_mvbs",
    "run_survey_mvbs_from_raw",
]
