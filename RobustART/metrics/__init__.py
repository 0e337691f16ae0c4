"""reference RobustART/metrics parity — with ALL evaluators exported (the
reference's own __init__ exported only two, breaking its README examples;
metrics/__init__.py:1-3 vs README.md:139-143)."""

from robustart_tpu.metrics import (  # noqa: F401
    AdvRobustEvaluator,
    ImageNetAEvaluator,
    ImageNetCEvaluator,
    ImageNetEvaluator,
    ImageNetOEvaluator,
    ImageNetPEvaluator,
    ImageNetSEvaluator,
    WorstCaseAdvRobustEvaluator,
    calibration_tools,
)
