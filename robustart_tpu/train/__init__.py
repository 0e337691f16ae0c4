"""Training facade (reference RobustART/train/__init__.py:1-22): re-exports
the solver pipelines under their reference names."""

from robustart_tpu.solvers.cls_solver import ClsSolver as cls_solver
from robustart_tpu.solvers.imgnet_a_o_eval_solver import (
    ImgnetAOEvalSolver as imgnet_a_o_eval_solver,
)
from robustart_tpu.solvers.imgnet_p_eval_solver import (
    ImgnetPEvalSolver as imgnet_p_eval_solver,
)
from robustart_tpu.solvers.multi_eval_solver import (
    MultiEvalSolver as imgnet_c_eval_solver,
)

__all__ = [
    "cls_solver",
    "imgnet_a_o_eval_solver",
    "imgnet_p_eval_solver",
    "imgnet_c_eval_solver",
]
