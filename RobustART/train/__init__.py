"""reference RobustART/train parity (train/__init__.py:1-22)."""

from robustart_tpu.train import (  # noqa: F401
    cls_solver,
    imgnet_a_o_eval_solver,
    imgnet_c_eval_solver,
    imgnet_p_eval_solver,
)
