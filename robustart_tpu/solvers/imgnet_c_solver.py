"""Alias of multi_eval_solver (reference exposes both ``imgnet_c_solver`` and
``multi_eval_solver`` names — reference train/__init__.py:1, swin/eval.sh:2)."""

from robustart_tpu.solvers.multi_eval_solver import MultiEvalSolver, main

ImgnetCSolver = MultiEvalSolver

if __name__ == "__main__":
    main()
