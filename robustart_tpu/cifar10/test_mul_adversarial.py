"""Multi-attack adversarial evaluation CLI (reference
cifar10/code/test_mul_adversarial.py).

Attack menu (reference :136): clean, fgsm_8, pgdlinf_8, autolinf_8,
mimlinf_8, pgdl2_1.5, pgdl1_40 — accuracy under each over the test set.
All white-box attacks run as jitted grad loops with the dataset's own
normalization folded into the model (reference test.py:18-55 per-dataset
preprocessing).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import jax
import numpy as np

from robustart_tpu.attacks import ATTACKS
from robustart_tpu.cifar10.data import DATASET_STATS, load_dataset
from robustart_tpu.cifar10.eval_utils import build_model
from robustart_tpu.core.logging import get_logger

logger = get_logger("robustart.cifar_adv")

# attack name -> (robustart attack, config) matching the reference menu
ATTACK_MENU = {
    "clean": None,
    "fgsm_8": ("fgsm", {"eps": 8 / 255}),
    "pgdlinf_8": ("pgd_linf", {"eps": 8 / 255, "rel_stepsize": 0.1, "steps": 20}),
    "autolinf_8": ("autoattack_linf", {"eps": 8 / 255}),
    "mimlinf_8": ("mim_linf", {"eps": 8 / 255, "num_steps": 20,
                               "step_size": 0.002, "decay_factor": 1.0}),
    "pgdl2_1.5": ("pgd_l2", {"eps": 1.5, "rel_stepsize": 0.1, "steps": 20}),
    "pgdl1_40": ("pgd_l1", {"eps": 40.0, "eps_step": 4.0, "max_iter": 20}),
}


def test_adv(logits_fn, variables, test_x, test_y, attack_key, batch_size,
             seed=0, classifier=None):
    """Accuracy under one attack (reference test_mul_adversarial.py:131)."""
    entry = ATTACK_MENU[attack_key]
    key = jax.random.key(seed)
    correct = total = 0
    n = len(test_x)
    for bi, lo in enumerate(range(0, n - n % batch_size, batch_size)):
        xb = test_x[lo : lo + batch_size].astype(np.float32) / 255.0
        yb = test_y[lo : lo + batch_size]
        if entry is not None:
            name, cfg = entry
            if name == "autoattack_linf":
                from robustart_tpu.attacks.autoattack import AutoAttack

                aa = AutoAttack(classifier, norm="Linf", eps=cfg["eps"],
                                version="standard", seed=seed)
                xb = aa.run_standard_evaluation(xb, yb, bs=batch_size)
            else:
                xb = np.asarray(
                    ATTACKS[name](
                        logits_fn, variables, xb, yb,
                        jax.random.fold_in(key, bi), **cfg,
                    )
                )
        preds = np.asarray(logits_fn(variables, xb)).argmax(-1)
        correct += int((preds == yb).sum())
        total += len(yb)
    return 100.0 * correct / max(total, 1)


def run(args) -> dict:
    module, variables, logits_fn = build_model(
        args.model, args.dataset, args.checkpoint
    )
    mean, std, num_classes = DATASET_STATS[args.dataset]
    from robustart_tpu.models.classifier import Classifier

    classifier = Classifier(
        args.model, module, variables, mean, std, 32, num_classes
    )
    (_, _), (test_x, test_y) = load_dataset(args.dataset, args.data_dir)
    if args.limit:
        test_x, test_y = test_x[: args.limit], test_y[: args.limit]

    results = {}
    for attack_key in args.attacks:
        acc = test_adv(
            logits_fn, variables, test_x, test_y, attack_key,
            args.batch_size, args.seed, classifier,
        )
        results[attack_key] = acc
        logger.info("%s accuracy: %.2f%%", attack_key, acc)
    if args.output:
        os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description="CIFAR multi-attack eval")
    parser.add_argument("--model", default="ResNet18")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--attacks", nargs="+", default=list(ATTACK_MENU),
        choices=list(ATTACK_MENU),
    )
    parser.add_argument("--output", default=None)
    return run(parser.parse_args(argv))


if __name__ == "__main__":
    main()
