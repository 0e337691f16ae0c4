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
        subparser = subparsers.add_parser(
            name, help=f"subcommand for {name} metric"
        )
        subparser.add_argument(
            "--config", dest="config", required=True,
            help="settings of classification in yaml format",
        )
        subparser.add_argument(
            "--res_file", required=True, action="append",
            help="results file of classification",
        )
        return subparser

    @classmethod
    def from_args(cls, args):
        import yaml

        with open(args.config) as f:
            config = yaml.safe_load(f)
        kwargs = (
            config.get("data", {}).get("evaluator", {}).get("kwargs", {})
        )
        return cls(**kwargs)


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
