"""Transfer-attack matrix parser.

Equivalent of the reference's nips_benchmark/batch_eval_transfer/
parse_transfer.py:22-46: given the result-file tree written by
``benchmark_eval_adv`` for (src, tgt) pairs, compute the FGSM (or any
attack's) transfer rate matrix — the fraction of tgt-correct samples that an
adversarial example generated on src flips — from triple result files
(clean, src-whitebox, src→tgt transfer). Requires complete files (the
reference asserts exactly 50000 lines; configurable here).
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

import numpy as np

from robustart_tpu.metrics.evaluators import _parse_line


def _load_correct(path: str, expect_lines: int | None) -> np.ndarray:
    with open(path) as f:
        lines = f.readlines()
    if expect_lines is not None and len(lines) != expect_lines:
        raise ValueError(
            f"{path}: {len(lines)} lines, expected {expect_lines} — "
            "incomplete result file (reference parse_transfer.py:37)"
        )
    out = np.zeros(len(lines), bool)
    for i, line in enumerate(lines):
        a, b = _parse_line(line)
        out[i] = a == b
    return out


def transfer_rate(clean_path: str, adv_path: str,
                  expect_lines: int | None = None) -> float:
    """Fraction of clean-correct samples flipped by the transferred attack."""
    clean = _load_correct(clean_path, expect_lines)
    adv = _load_correct(adv_path, expect_lines)
    base = clean.sum()
    if base == 0:
        return 0.0
    return float(((clean) & (~adv)).sum() / base * 100.0)


def build_matrix(results_root: str, models: list[str], attack: str,
                 eps: str, expect_lines: int | None = None) -> dict:
    """matrix[src][tgt] = transfer rate, from the benchmark_eval_adv layout
    ``<root>/<src>_to_<tgt>/{clean,<attack>_<eps>}/results.txt.all``."""
    matrix: dict[str, dict[str, float]] = {}
    for src in models:
        matrix[src] = {}
        for tgt in models:
            pair = osp.join(results_root, f"{src}_to_{tgt}")
            clean = osp.join(pair, "clean", "results.txt.all")
            adv = osp.join(pair, f"{attack}_{eps}", "results.txt.all")
            if osp.exists(clean) and osp.exists(adv):
                matrix[src][tgt] = transfer_rate(clean, adv, expect_lines)
    return matrix


def main(argv=None):
    parser = argparse.ArgumentParser(description="transfer-attack matrix")
    parser.add_argument("--results_root", required=True)
    parser.add_argument("--models", nargs="+", required=True)
    parser.add_argument("--attack", default="fgsm")
    parser.add_argument("--eps", default="8")
    parser.add_argument("--expect_lines", type=int, default=None)
    parser.add_argument("--output", default=None)
    args = parser.parse_args(argv)
    matrix = build_matrix(
        args.results_root, args.models, args.attack, args.eps,
        args.expect_lines,
    )
    print(json.dumps(matrix, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(matrix, f, indent=2)
    return matrix


if __name__ == "__main__":
    main()
