"""Leaderboard export — aggregate benchmark results into one table.

The reference publishes results on the external robust.art leaderboard
(reference README.md:9) with per-model columns: clean top-1, mCE
(ImageNet-C), ImageNet-A top-1, ImageNet-O AUPR, mFR (ImageNet-P),
ImageNet-S mean/std, AR/WCAR. This tool scans the result trees the solvers
write and emits those columns as JSON + a markdown table.

Layout scanned (one root per model):
    <root>/<model>/imagenet-c/summary.json
    <root>/<model>/imagenet-a_o/imagenet-{a,o}/...
    <root>/<model>/imagenet-p/... (re-evaluated from result files)
    <root>/<model>/imagenet-s/summary.json
    <root>/<model>/adv/*/results.txt.all (clean + attacks)
    <root>/<model>/clean/results.txt.all
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

from robustart_tpu.core.logging import get_logger
from robustart_tpu.metrics import (
    AdvRobustEvaluator,
    ImageNetEvaluator,
    ImageNetPEvaluator,
    WorstCaseAdvRobustEvaluator,
)

logger = get_logger("robustart.leaderboard")


def _maybe_json(path):
    if osp.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def collect_model(model_dir: str) -> dict:
    row: dict = {}
    c = _maybe_json(osp.join(model_dir, "imagenet-c", "summary.json"))
    if c:
        row["mCE"] = c.get("mCE")
        row["imagenet_c_top1"] = c.get("mean_top1")
        if c.get("non_comparable"):
            # e.g. frost runs on substituted assets — flag it so exported
            # tables never silently compare against published numbers
            row["non_comparable"] = sorted(c["non_comparable"])
    s = _maybe_json(osp.join(model_dir, "imagenet-s", "summary.json"))
    if s:
        row["imagenet_s_mean"] = s.get("Mean")
        row["imagenet_s_std"] = s.get("Std.")

    clean = osp.join(model_dir, "clean", "results.txt.all")
    if osp.exists(clean):
        try:
            m = ImageNetEvaluator().eval(clean)
            row["clean_top1"] = m.metric.get("top1")
        except (KeyError, json.JSONDecodeError):
            pass

    a_res = osp.join(model_dir, "imagenet-a_o", "imagenet-a", "results.txt.all")
    if osp.exists(a_res):
        row["imagenet_a_top1"] = ImageNetEvaluator(topk=(1,)).eval(
            a_res
        ).metric["top1"]
    o_dir = osp.join(model_dir, "imagenet-a_o", "imagenet-o")
    if osp.exists(osp.join(o_dir, "results_in.txt.all")):
        from robustart_tpu.metrics import ImageNetOEvaluator

        row["imagenet_o_aupr"] = ImageNetOEvaluator().eval(
            res_file_in=osp.join(o_dir, "results_in.txt.all"),
            res_file_out=osp.join(o_dir, "results_out.txt.all"),
        )["AUPR"]

    p_dir = osp.join(model_dir, "imagenet-p")
    if osp.isdir(p_dir):
        ev = ImageNetPEvaluator()
        for pert in sorted(os.listdir(p_dir)):
            res = osp.join(p_dir, pert, "results.txt.all")
            if osp.exists(res):
                ev.eval(res, perturbation=pert)
        if ev.metric.metric:
            row["mFR"] = ev.get_mean()["Mean"]

    adv_dir = osp.join(model_dir, "adv")
    if osp.isdir(adv_dir):
        # the benchmark solver writes <src>_to_<tgt>/{clean,<attack>_<eps>}
        for pair in sorted(os.listdir(adv_dir)):
            pd = osp.join(adv_dir, pair)
            clean_f = osp.join(pd, "clean", "results.txt.all")
            if not osp.exists(clean_f):
                continue
            attack_files = [
                osp.join(pd, d, "results.txt.all")
                for d in sorted(os.listdir(pd))
                if d != "clean" and osp.exists(osp.join(pd, d, "results.txt.all"))
            ]
            n = len(open(clean_f).readlines())
            ars = {}
            for f in attack_files:
                name = osp.basename(osp.dirname(f))
                ars[name] = AdvRobustEvaluator().eval(clean_f, f, num_samples=n)
            if ars:
                row.setdefault("AR", {}).update(ars)
                row["WCAR"] = WorstCaseAdvRobustEvaluator().eval(
                    clean_f, attack_files, num_samples=n
                )
    return row


COLUMNS = [
    "clean_top1", "mCE", "imagenet_a_top1", "imagenet_o_aupr", "mFR",
    "imagenet_s_mean", "imagenet_s_std", "WCAR",
]


def build_table(results_root: str) -> dict:
    table = {}
    for model in sorted(os.listdir(results_root)):
        d = osp.join(results_root, model)
        if osp.isdir(d):
            row = collect_model(d)
            if row:
                table[model] = row
    return table


def to_markdown(table: dict) -> str:
    lines = ["| model | " + " | ".join(COLUMNS) + " |",
             "|" + "---|" * (len(COLUMNS) + 1)]
    for model, row in table.items():
        cells = [
            f"{row[c]:.2f}" if isinstance(row.get(c), (int, float)) else "—"
            for c in COLUMNS
        ]
        lines.append(f"| {model} | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main(argv=None):
    parser = argparse.ArgumentParser(description="results leaderboard export")
    parser.add_argument("--results_root", required=True)
    parser.add_argument("--output", default=None, help="json output path")
    parser.add_argument("--markdown", default=None, help="markdown output path")
    args = parser.parse_args(argv)
    table = build_table(args.results_root)
    print(to_markdown(table))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(table, f, indent=2)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(to_markdown(table) + "\n")
    return table


if __name__ == "__main__":
    main()
