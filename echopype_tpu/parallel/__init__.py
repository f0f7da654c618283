from .mesh import make_mesh
from .pipeline import sharded_sv_mvbs_step, survey_pipeline_step

__all__ = ["make_mesh", "sharded_sv_mvbs_step", "survey_pipeline_step"]
