"""reference RobustART/model parity (model/__init__.py:1)."""

from robustart_tpu.models import get_model  # noqa: F401
