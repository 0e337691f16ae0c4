"""YAML config system with the reference's config vocabulary.

The reference drives every solver from a YAML file with an attribute-dict
(easydict) schema shared by train and eval (reference exprs/*/config.yaml;
schema walkthrough in SURVEY.md §2.7). We keep the exact same vocabulary —
``model{type,kwargs}``, ``optimizer``, ``lr_scheduler``, ``label_smooth``,
``mixup``, ``cutmix``, ``ema``, ``data{type,read_from,batch_size,...}``,
``saver{pretrain{path,ignore{key,model}}}``, ``eval_list`` — but back it with
a validated recursive attribute-dict instead of a raw easydict.
"""

from __future__ import annotations

import copy
import io
import os
from typing import Any, Iterator, Mapping

import yaml


class Config(dict):
    """Recursive attribute-dict: ``cfg.model.type`` == ``cfg['model']['type']``.

    Mirrors the easydict behavior the reference relies on
    (reference requirements.txt:17) while staying a plain dict for
    serialization. Missing attribute access raises ``AttributeError`` (not
    KeyError) so ``getattr(cfg, 'ema', None)`` idioms work.
    """

    def __init__(self, data: Mapping[str, Any] | None = None, **kwargs: Any):
        super().__init__()
        merged: dict[str, Any] = {}
        if data:
            merged.update(data)
        merged.update(kwargs)
        for key, value in merged.items():
            self[key] = value

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, Config):
            return value
        if isinstance(value, Mapping):
            return Config(value)
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    def __setitem__(self, key: str, value: Any) -> None:
        super().__setitem__(key, Config._wrap(value))

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def __delattr__(self, key: str) -> None:
        try:
            del self[key]
        except KeyError as exc:
            raise AttributeError(key) from exc

    def get_path(self, dotted: str, default: Any = None) -> Any:
        """Fetch ``cfg.get_path('data.train.sampler.type')`` with a default."""
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def merged(self, other: Mapping[str, Any]) -> "Config":
        """Deep-merge ``other`` on top of this config (returns a new Config)."""
        out = copy.deepcopy(self)

        def _merge(dst: Config, src: Mapping[str, Any]) -> None:
            for key, value in src.items():
                if (
                    key in dst
                    and isinstance(dst[key], Mapping)
                    and isinstance(value, Mapping)
                ):
                    _merge(dst[key], value)
                else:
                    dst[key] = value

        _merge(out, other)
        return out

    def to_dict(self) -> dict[str, Any]:
        def _unwrap(value: Any) -> Any:
            if isinstance(value, Mapping):
                return {k: _unwrap(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return [_unwrap(v) for v in value]
            return value

        return _unwrap(self)

    def dump_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)


def load_config(path_or_stream: str | os.PathLike | io.IOBase) -> Config:
    """Load a YAML config file into a :class:`Config`.

    Same entry semantics as the reference solvers' ``--config config.yaml``
    (reference README.md:91; exprs/*/run.sh).
    """
    if isinstance(path_or_stream, io.IOBase):
        raw = yaml.safe_load(path_or_stream)
    else:
        with open(path_or_stream) as f:
            raw = yaml.safe_load(f)
    if raw is None:
        raw = {}
    if not isinstance(raw, Mapping):
        raise ValueError(f"Config root must be a mapping, got {type(raw)!r}")
    return Config(raw)


def iter_eval_list(cfg: Config) -> Iterator[Config]:
    """Expand a top-level ``eval_list`` into per-checkpoint configs.

    The reference batch-evaluates many checkpoints from one config via a
    top-level ``eval_list`` of override dicts (reference README.md:70-91,
    exprs/exp/swin/config.yaml:8-10). Each entry is deep-merged onto the base.
    """
    entries = cfg.get("eval_list") or [{}]
    for entry in entries:
        if isinstance(entry, str):
            # the reference's batch lists are plain model names
            # (reference exprs/exp/swin/config.yaml:8-10)
            entry = {"model": {"type": entry}}
        sub = cfg.merged(entry if isinstance(entry, Mapping) else {})
        sub.pop("eval_list", None)
        _align_input_size(sub)
        yield sub


def _align_input_size(sub: Config) -> None:
    """Feed models with a non-default native resolution (swin_base_384 in
    the reference swin eval_list) their own input size: override
    data.input_size and scale test_resize keeping the config's resize/crop
    ratio. Without this the 384 model gets 224 crops (56 spatial is not
    divisible by its window 12) and the eval crashes."""
    try:
        from robustart_tpu.models.registry import model_meta

        native = int(model_meta(sub.model.type)["input_size"])
    except Exception:
        return
    data = sub.get("data")
    if data is None:
        return
    cur = int(data.get("input_size", 224))
    if native == cur:
        return
    resize = int(data.get("test_resize", round(cur * 256 / 224)))
    data.input_size = native
    data.test_resize = max(native, round(resize * native / cur))
