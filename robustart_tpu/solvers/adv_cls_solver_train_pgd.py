"""``adv_cls_solver_train_pgd`` (+ ``_new``) — PGD adversarial training.

Reference equivalents: ``prototype.prototype.solver.adv_cls_solver_train_pgd``
(SGD recipe, reference nips_benchmark/pgd_adv_train/resnet50/run.sh:2) and
``adv_cls_solver_train_pgd_new`` (AdamW + no_wd recipe, reference
new_adv_train/vit_base/run.sh:11, config.yaml:11-15). Both are thin entry
points over :class:`ClsSolver` with ``adv_train`` enabled — the PGD
generation (two extra fwd+bwd per attack step, the adv-train hot loop,
SURVEY.md §3.2) runs INSIDE the single jitted train step, so attack
generation and the weight update compile into one XLA program with zero
host round-trips.

Config block::

    adv_train:
        enable: True
        attack: pgd_linf          # any robustart_tpu.attacks name
        kwargs: {eps: 0.0157, rel_stepsize: 0.25, steps: 7}
"""

from __future__ import annotations

from robustart_tpu.core.config import Config
from robustart_tpu.solvers.base import standard_solver_argparser
from robustart_tpu.solvers.cls_solver import ClsSolver

DEFAULT_ADV = {
    "enable": True,
    "attack": "pgd_linf",
    # canonical ImageNet adv-training budget (eps 4/255, 3-step PGD)
    "kwargs": {"eps": 4 / 255, "rel_stepsize": 1 / 3, "steps": 3},
}


class AdvClsSolverTrainPGD(ClsSolver):
    def __init__(self, config, evaluate_only: bool = False):
        super().__init__(config, evaluate_only)
        if "adv_train" not in self.cfg:
            self.cfg.adv_train = Config(DEFAULT_ADV)
        else:
            self.cfg.adv_train.setdefault("enable", True)


def main(argv=None):
    parser = standard_solver_argparser("robustart adv_cls_solver_train_pgd")
    args = parser.parse_args(argv)
    solver = AdvClsSolverTrainPGD(args.config, evaluate_only=args.evaluate)
    if args.evaluate:
        return solver.evaluate(ckpt_path=args.ckpt_filePath)
    solver.train(recover=args.recover)
    return solver.evaluate()


if __name__ == "__main__":
    main()
