"""Solvers — train/eval pipelines with the reference CLI surface
(reference prototype.prototype.solver.*; SURVEY.md §2.9).

Module-level entry points (``python -m robustart_tpu.solvers.<name>
--config config.yaml [--evaluate] [--recover …] [--ckpt-filePath …]``):

- ``cls_solver``                        — classification train + eval
- ``multi_eval_solver``                 — ImageNet-C corruption loop
  (alias: ``imgnet_c_solver``)
- ``imgnet_a_o_eval_solver``            — ImageNet-A accuracy + -O OOD
- ``imgnet_p_eval_solver``              — ImageNet-P flip rates
- ``multi_eval_decoder_resize_solver``  — ImageNet-S decoder×resize loop
- ``benchmark_eval_adv``                — adversarial AR/transfer benchmark
  (alias: ``base_benchmark_eval_adv``)
- ``adv_cls_solver_train_pgd``          — PGD adversarial training
  (alias: ``adv_cls_solver_train_pgd_new`` via AdamW config)
"""

from robustart_tpu.solvers.adv_cls_solver_train_pgd import AdvClsSolverTrainPGD
from robustart_tpu.solvers.base import (
    ResultWriter,
    Solver,
    load_checkpoint,
    save_checkpoint,
)
from robustart_tpu.solvers.benchmark_eval_adv import BenchmarkEvalAdvSolver
from robustart_tpu.solvers.cls_solver import ClsSolver
from robustart_tpu.solvers.imgnet_a_o_eval_solver import ImgnetAOEvalSolver
from robustart_tpu.solvers.imgnet_p_eval_solver import ImgnetPEvalSolver
from robustart_tpu.solvers.multi_eval_decoder_resize_solver import (
    MultiEvalDecoderResizeSolver,
)
from robustart_tpu.solvers.multi_eval_solver import MultiEvalSolver

__all__ = [
    "Solver",
    "ResultWriter",
    "save_checkpoint",
    "load_checkpoint",
    "ClsSolver",
    "MultiEvalSolver",
    "ImgnetAOEvalSolver",
    "ImgnetPEvalSolver",
    "MultiEvalDecoderResizeSolver",
    "BenchmarkEvalAdvSolver",
    "AdvClsSolverTrainPGD",
]
