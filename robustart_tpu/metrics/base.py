"""Evaluator/Metric base classes.

Mirrors reference RobustART/metrics/base_evaluator.py:7-48 — evaluators
consume per-sample JSON-lines *result files*, not live tensors: the
filesystem is the interface between evaluation and metric computation
(SURVEY.md §1, a load-bearing design property kept verbatim).
"""

from __future__ import annotations

import json
from typing import Any


class Metric:
    """Base metric: a dict of named values plus a comparison key."""

    def __init__(self, metric_dict: dict | None = None):
        self.metric = dict(metric_dict or {})
        self.cmp_key: str | None = None
        self.v: Any = None

    def __str__(self) -> str:
        return f"metric={self.metric} key={self.cmp_key}"

    __repr__ = __str__

    def update(self, up_dict: dict | None = None) -> None:
        self.metric.update(up_dict or {})

    def set_cmp_key(self, key: str) -> None:
        self.cmp_key = key
        self.v = self.metric[key]


class Evaluator:
    """Base class for an evaluator over result files."""

    def eval(self, res_file: str, **kwargs):
        """Return a Metric computed from a JSON-lines result file."""
        raise NotImplementedError

    @staticmethod
    def add_subparser(name, subparsers):
        """Offline-CLI subcommand hook (reference
        imagenetc_evaluator.py:77-86; every reference evaluator exposes the
        same ``--config``/``--res_file`` vocabulary). ``--config`` is
        optional here: our evaluator ctors carry usable defaults."""
        subparser = subparsers.add_parser(
            name, help=f"subcommand for {name} metric"
        )
        subparser.add_argument(
            "--config", dest="config", default=None,
            help="settings of classification in yaml format",
        )
        subparser.add_argument(
            "--res_file", action="append", default=None,
            help="results file of classification",
        )
        return subparser

    @classmethod
    def from_args(cls, args):
        """Build the evaluator from parsed CLI args (reference
        imagenetc_evaluator.py:88-94 reads ``data.evaluator.kwargs``; we
        also accept the solver schema's ``data.test.evaluator.kwargs`` and
        drop keys the ctor doesn't take)."""
        import inspect

        kwargs = {}
        config_path = getattr(args, "config", None)
        if config_path:
            import yaml

            with open(config_path) as f:
                config = yaml.safe_load(f) or {}
            data = config.get("data") or {}
            ev = (
                data.get("evaluator")
                or (data.get("test") or {}).get("evaluator")
                or {}
            )
            kwargs = dict(ev.get("kwargs") or {})
        accepted = inspect.signature(cls.__init__).parameters
        kwargs = {k: v for k, v in kwargs.items() if k in accepted}
        return cls(**kwargs)

    def run_from_args(self, args):
        """Default offline-CLI body: eval each ``--res_file``."""
        out = {}
        for res_file in args.res_file or []:
            metric = self.eval(res_file)
            out[res_file] = (
                dict(metric.metric) if isinstance(metric, Metric) else metric
            )
        return out


def load_res_columns(res_file: str) -> dict[str, list]:
    """Parse a JSON-lines result file into column lists
    (reference imagenetc_evaluator.py:35-49)."""
    res: dict[str, list] = {}
    with open(res_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            info = json.loads(line)
            for key, value in info.items():
                res.setdefault(key, []).append(value)
    return res


def load_res_field(res_file: str, field: str) -> list:
    out = []
    with open(res_file) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line)[field])
    return out
