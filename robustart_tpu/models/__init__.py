"""Model zoo (Flax, NHWC, TPU-first).

``get_model`` mirrors the reference facade ``RobustART.model.get_model``
(reference RobustART/model/__init__.py:1).
"""

from robustart_tpu.models.classifier import Classifier, init_classifier
from robustart_tpu.models.registry import (
    MODELS,
    create_classifier,
    get_model,
    model_meta,
    model_names,
)

__all__ = [
    "MODELS",
    "Classifier",
    "init_classifier",
    "create_classifier",
    "get_model",
    "model_meta",
    "model_names",
]
