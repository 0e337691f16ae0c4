"""Metrics/evaluators (reference RobustART/metrics/; SURVEY.md §2.4).

Unlike the reference ``__init__`` (which exported only two evaluators,
breaking its own README examples — reference metrics/__init__.py:1-3 vs
README.md:139-143), every evaluator is exported here.
"""

from robustart_tpu.metrics import calibration as calibration_tools
from robustart_tpu.metrics.base import Evaluator, Metric
from robustart_tpu.metrics.evaluators import (
    ALEXNET_ERR,
    AdvRobustEvaluator,
    ClsMetric,
    ImageNetAEvaluator,
    ImageNetCEvaluator,
    ImageNetEvaluator,
    ImageNetOEvaluator,
    ImageNetPEvaluator,
    ImageNetSEvaluator,
    WorstCaseAdvRobustEvaluator,
    mean_corruption_error,
    topk_accuracy,
)

__all__ = [
    "Evaluator",
    "Metric",
    "ClsMetric",
    "ImageNetEvaluator",
    "ImageNetCEvaluator",
    "ImageNetAEvaluator",
    "ImageNetOEvaluator",
    "ImageNetPEvaluator",
    "ImageNetSEvaluator",
    "AdvRobustEvaluator",
    "WorstCaseAdvRobustEvaluator",
    "calibration_tools",
    "topk_accuracy",
    "mean_corruption_error",
    "ALEXNET_ERR",
]
