"""Offline metric CLI: ``python -m robustart_tpu.metrics <evaluator> ...``.

The reference's evaluators each expose ``add_subparser``/``from_args``
subcommand hooks for computing metrics from result files on the command
line (reference RobustART/metrics/imagenetc_evaluator.py:77-94; the same
pattern in imageneta/o/p/s_evaluator.py). This module wires every
evaluator's hooks into one entry point:

    python -m robustart_tpu.metrics imagenet   --res_file results.txt.all
    python -m robustart_tpu.metrics imagenet-c --res_file .../results.txt.all
    python -m robustart_tpu.metrics imagenet-a --res_file r1 --res_file r2
    python -m robustart_tpu.metrics imagenet-o --res_file_in in --res_file_out out
    python -m robustart_tpu.metrics imagenet-p --res_file r --perturbation gaussian_noise
    python -m robustart_tpu.metrics imagenet-s --res_file r --decoder_type pil --resize_type pil-bilinear
    python -m robustart_tpu.metrics ar   --clean_path clean --adv_path adv
    python -m robustart_tpu.metrics wcar --clean_path clean --adv_path a1 --adv_path a2

Each subcommand prints one JSON object with the computed metrics (the
ImageNet-C evaluator additionally writes the reference's ``metric`` file
beside each result file, reference imagenetc_evaluator.py:71-74).
"""

from __future__ import annotations

import argparse
import json
import sys

from robustart_tpu.metrics.evaluators import (
    AdvRobustEvaluator,
    ImageNetAEvaluator,
    ImageNetCEvaluator,
    ImageNetEvaluator,
    ImageNetOEvaluator,
    ImageNetPEvaluator,
    ImageNetSEvaluator,
    WorstCaseAdvRobustEvaluator,
)

EVALUATORS = {
    "imagenet": ImageNetEvaluator,
    "imagenet-c": ImageNetCEvaluator,
    "imagenet-a": ImageNetAEvaluator,
    "imagenet-o": ImageNetOEvaluator,
    "imagenet-p": ImageNetPEvaluator,
    "imagenet-s": ImageNetSEvaluator,
    "ar": AdvRobustEvaluator,
    "wcar": WorstCaseAdvRobustEvaluator,
}


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="python -m robustart_tpu.metrics",
        description="offline metric computation from result files",
    )
    subparsers = parser.add_subparsers(dest="evaluator", required=True)
    for name, cls in EVALUATORS.items():
        cls.add_subparser(name, subparsers)
    args = parser.parse_args(argv)
    cls = EVALUATORS[args.evaluator]
    evaluator = cls.from_args(args)
    result = evaluator.run_from_args(args)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
