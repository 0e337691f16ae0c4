"""Logging utilities.

Equivalent of the reference's ``prototype.prototype.utils.misc.get_logger``
(usage evidence: reference RobustART/metrics/calibration_tools.py:3-5).
Rank-aware: only rank 0 logs at INFO by default so multi-host runs don't
interleave 8 copies of every line.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s %(levelname)s [%(name)s] %(message)s"
_configured: set[str] = set()


def get_logger(
    name: str = "robustart",
    log_file: str | None = None,
    level: int | None = None,
    rank: int | None = None,
) -> logging.Logger:
    """Create (or fetch) a configured logger.

    Args:
        name: logger name.
        log_file: optional path to also append logs to (the reference keeps
            durable text logs next to checkpoints, cifar10/code/train.py:206).
        level: explicit level; defaults to INFO on rank 0, WARNING elsewhere.
        rank: process rank; defaults to ``RANK`` env var or 0.
    """
    logger = logging.getLogger(name)
    key = f"{name}::{log_file or ''}"
    if key in _configured:
        return logger
    _configured.add(key)

    if rank is None:
        rank = int(os.environ.get("RANK", "0"))
    if level is None:
        level = logging.INFO if rank == 0 else logging.WARNING
    logger.setLevel(level)
    logger.propagate = False

    formatter = logging.Formatter(_FORMAT)
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        stream = logging.StreamHandler(sys.stdout)
        stream.setFormatter(formatter)
        logger.addHandler(stream)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fileh = logging.FileHandler(log_file)
        fileh.setFormatter(formatter)
        logger.addHandler(fileh)
    return logger
