"""Model facade (reference RobustART/model/__init__.py:1): ``get_model``."""

from robustart_tpu.models import get_model

__all__ = ["get_model"]
