"""Core runtime: config system, logging, registry, mesh/distributed init."""

from robustart_tpu.core.config import Config, load_config
from robustart_tpu.core.logging import get_logger
from robustart_tpu.core.registry import Registry
from robustart_tpu.core.dist import DistContext, init_distributed, get_mesh

__all__ = [
    "Config",
    "load_config",
    "get_logger",
    "Registry",
    "DistContext",
    "init_distributed",
    "get_mesh",
]
