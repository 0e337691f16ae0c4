"""Checkpoint backends: flax msgpack (default) and Orbax, with auto-resume.

The reference's recovery story is manual ``--recover=checkpoints/ckpt.pth.tar``
plus idempotent result files (SURVEY.md §5.3-5.4); this build adds Orbax for
async multi-host-safe checkpoints and ``latest_checkpoint`` auto-resume
discovery, while the msgpack path stays for single-file portability.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any

from robustart_tpu.core.logging import get_logger
from robustart_tpu.solvers.base import load_checkpoint, save_checkpoint

logger = get_logger(__name__)


def save_orbax(directory: str, step: int, payload: Any) -> str:
    """Save a pytree with Orbax under ``directory/step_<n>``."""
    import orbax.checkpoint as ocp

    path = osp.join(osp.abspath(directory), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_orbax(path: str, template: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


def latest_checkpoint(directory: str) -> str | None:
    """Newest checkpoint in a directory — Orbax ``step_N`` dirs or
    ``*.msgpack`` files — for automatic resume."""
    if not osp.isdir(directory):
        return None
    orbax_steps = []
    msgpacks = []
    for name in os.listdir(directory):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and osp.isdir(osp.join(directory, name)):
            orbax_steps.append((int(m.group(1)), name))
        elif name.endswith(".msgpack"):
            msgpacks.append(name)
    if orbax_steps:
        return osp.join(directory, max(orbax_steps)[1])
    if msgpacks:
        return osp.join(
            directory,
            max(msgpacks, key=lambda n: osp.getmtime(osp.join(directory, n))),
        )
    return None


def save_any(path_or_dir: str, payload: Any, step: int = 0,
             backend: str = "msgpack") -> str:
    if backend == "orbax":
        return save_orbax(path_or_dir, step, payload)
    save_checkpoint(path_or_dir, payload.get("variables", payload),
                    extra=payload.get("extra"))
    return path_or_dir


def load_any(path: str, template: Any | None = None) -> Any:
    if osp.isdir(path) and re.search(r"step_\d+$", path):
        return load_orbax(path, template)
    return load_checkpoint(path)
