"""``benchmark_eval_adv`` / ``base_benchmark_eval_adv`` — adversarial
benchmark with src→tgt transfer support.

Reference equivalent: the solvers driven by
exprs/nips_benchmark/batch_eval_adv/eval.sh:46 and
batch_eval_transfer/…auto_arch.sh:28 with CLI
``--src_name/--src_path/--tgt_name/--tgt_path/--attack/--eps`` (SURVEY.md
§2.9): the **src** model generates the attack, the **tgt** model is
evaluated on the adversarial examples (src == tgt → white-box AR; src != tgt
→ transfer matrix via parse_transfer). Writes
``<out>/<attack>_<eps>/results.txt.all`` with {"prediction": p, "label": l}
lines (the char-parser protocol of AR_evaluator.py:13-21 and
parse_transfer.py:27), plus a clean ``results.txt.all`` for the AR
denominator.

Attack budget grid of the reference benchmark
(batch_eval_adv/eval.sh:9-13): fgsm/pgd_linf/autoattack_linf/mim_linf at
eps {0.5, 2, 8}/255; pgd_l2 at {0.5, 2, 8}; pgd_l1 at {100, 400, 1600}.
"""

from __future__ import annotations

import os.path as osp

import jax
import numpy as np

from robustart_tpu.attacks import ATTACKS, make_attack_fn
from robustart_tpu.core.config import Config
from robustart_tpu.core.logging import get_logger
from robustart_tpu.data import build_dataloader
from robustart_tpu.metrics import AdvRobustEvaluator
from robustart_tpu.models import create_classifier
from robustart_tpu.solvers.base import (
    ResultWriter,
    Solver,
    load_checkpoint,
    load_pretrain_into,
    standard_solver_argparser,
)

logger = get_logger("robustart.adv_eval")

# attack-specific eps semantics: linf eps given in /255 units on the CLI
def normalize_eps(attack: str, eps: float) -> float:
    if attack in ("fgsm", "pgd_linf", "mim_linf", "autoattack_linf") and eps > 1:
        return eps / 255.0
    return eps


def attack_config(attack: str, eps: float) -> dict:
    eps = normalize_eps(attack, eps)
    if attack == "pgd_linf":
        return {"eps": eps, "rel_stepsize": 3 / 40, "steps": 20}
    if attack == "pgd_l2":
        return {"eps": eps, "rel_stepsize": 3 / 40, "steps": 20}
    if attack == "fgsm":
        return {"eps": eps}
    if attack == "mim_linf":
        return {"eps": eps, "num_steps": 20, "step_size": 0.002,
                "decay_factor": 1.0}
    if attack == "pgd_l1":
        return {"eps": eps, "eps_step": eps * 0.075, "max_iter": 20}
    if attack == "autoattack_linf":
        return {"eps": eps}
    raise ValueError(f"unknown attack {attack!r}")


class BenchmarkEvalAdvSolver(Solver):
    def __init__(self, config, src_name=None, src_path=None, tgt_name=None,
                 tgt_path=None, attack="pgd_linf", eps=8.0):
        super().__init__(config, evaluate_only=True)
        self.src_name = src_name or self.cfg.model.type
        self.tgt_name = tgt_name or self.src_name
        self.src_path = src_path
        self.tgt_path = tgt_path
        self.attack = attack
        self.eps = float(eps)

    def _build(self, name, path):
        kwargs = dict(self.cfg.model.get("kwargs") or {})
        clf = create_classifier(name, rng=0, **kwargs)
        if path:
            if path.endswith((".pth", ".pth.tar", ".pt", ".bin")):
                from robustart_tpu.models.torch_convert import load_torch_checkpoint

                clf.variables = load_torch_checkpoint(path, clf)
            else:
                clf.variables = load_checkpoint(path)["variables"]
        else:
            load_pretrain_into(clf, self.cfg.get("saver"))
        return clf

    def evaluate(self) -> dict:
        cfg = self.cfg
        src = self._build(self.src_name, self.src_path)
        tgt = (
            src
            if (self.tgt_name == self.src_name and self.tgt_path == self.src_path)
            else self._build(self.tgt_name, self.tgt_path)
        )
        out_root = cfg.get_path(
            "saver.results_dir",
            osp.join("results", "adv", f"{self.src_name}_to_{self.tgt_name}"),
        )
        eps_tag = (
            f"{self.eps:g}" if self.eps == int(self.eps) or self.eps >= 1
            else f"{self.eps:g}"
        )
        adv_dir = osp.join(out_root, f"{self.attack}_{eps_tag}")
        clean_file = osp.join(out_root, "clean", "results.txt.all")
        adv_file = osp.join(adv_dir, "results.txt.all")

        loader = build_dataloader(
            cfg.data, "test", self.rank, self.world_size,
            seed=int(cfg.get("seed", 0)),
        )
        limit = cfg.get_path("data.test.limit_samples")

        config = attack_config(self.attack, self.eps)
        # per-config hyperparameter overrides (e.g. fewer AutoAttack iters
        # for smoke runs): cfg.attack_kwargs merges into the attack config
        config.update(dict(cfg.get("attack_kwargs") or {}))
        import jax.numpy as jnp

        if self.attack == "autoattack_linf":
            # AutoAttack's cascade worklist is host-orchestrated — the
            # adversarial batch must round-trip; only the argmax fuses.
            from robustart_tpu.attacks.autoattack import AutoAttack

            aa_kwargs = dict(cfg.get("autoattack_kwargs") or {})
            aa = AutoAttack(src, norm="Linf", eps=config["eps"],
                            version="standard", verbose=False, **aa_kwargs)
            pred_fn = jax.jit(
                lambda v, x01: jnp.argmax(
                    tgt.apply_fn(v, x01, train=False), -1
                )
            )

            def batch_preds(images_u8, labels, key):
                x01 = images_u8.astype(np.float32) / 255.0
                clean = np.asarray(pred_fn(tgt.variables, x01))
                x_adv = aa.run_standard_evaluation(
                    x01, labels, bs=x01.shape[0]
                )
                adv = np.asarray(
                    pred_fn(tgt.variables, np.asarray(x_adv))
                )
                return clean, adv
        else:
            # gradient attacks fuse end-to-end: uint8 in, attack generation,
            # BOTH target forwards and the argmaxes in ONE XLA program —
            # fetch 2·B int32 per batch instead of round-tripping the
            # adversarial image batch and two full logits arrays.
            attack_pure = make_attack_fn(
                self.attack,
                lambda v, img: src.apply_fn(v, img, train=False),
                jit=False,
                **config,
            )

            @jax.jit
            def fused(src_vars, tgt_vars, images_u8, labels, key):
                x01 = images_u8.astype(jnp.float32) / 255.0
                clean = jnp.argmax(
                    tgt.apply_fn(tgt_vars, x01, train=False), -1
                )
                x_adv = attack_pure(src_vars, x01, labels, key)
                adv = jnp.argmax(
                    tgt.apply_fn(tgt_vars, x_adv, train=False), -1
                )
                return clean, adv

            attack_jit = make_attack_fn(
                self.attack,
                lambda v, img: src.apply_fn(v, img, train=False),
                jit=True,
                **config,
            )
            pred_fn = jax.jit(
                lambda v, x01: jnp.argmax(
                    tgt.apply_fn(v, x01, train=False), -1
                )
            )
            state = {"fused": True}

            def batch_preds(images_u8, labels, key):
                if state["fused"]:
                    try:
                        clean, adv = fused(
                            src.variables, tgt.variables,
                            jnp.asarray(images_u8), jnp.asarray(labels), key,
                        )
                        return np.asarray(clean), np.asarray(adv)
                    except jax.errors.JaxRuntimeError as e:
                        # a fusion-emitter abort only kills the out-of-process
                        # compile helper — fall back to split dispatches
                        logger.warning(
                            "fused attack-eval program failed to compile "
                            "(%s); falling back to split dispatches",
                            str(e).splitlines()[0][:160],
                        )
                        state["fused"] = False
                x01 = images_u8.astype(np.float32) / 255.0
                clean = np.asarray(pred_fn(tgt.variables, x01))
                x_adv = attack_jit(src.variables, x01, labels, key)
                adv = np.asarray(
                    pred_fn(tgt.variables, np.asarray(x_adv))
                )
                return clean, adv

        w_clean = ResultWriter(clean_file, self.rank, self.world_size)
        w_adv = ResultWriter(adv_file, self.rank, self.world_size)
        key = jax.random.key(int(cfg.get("seed", 0)))
        n = 0
        for bi, batch in enumerate(loader):
            labels = batch.label
            clean_pred, adv_pred = batch_preds(
                batch.image, labels, jax.random.fold_in(key, bi)
            )
            for i in range(len(batch.mask)):
                if batch.mask[i]:
                    w_clean.write(
                        {"prediction": int(clean_pred[i]), "label": int(labels[i])}
                    )
                    w_adv.write(
                        {"prediction": int(adv_pred[i]), "label": int(labels[i])}
                    )
                    n += 1
            if limit and n >= limit:
                break
        w_clean.close(), w_adv.close()
        clean_merged = w_clean.merge()
        adv_merged = w_adv.merge()
        if self.rank != 0:
            return {}
        ar = AdvRobustEvaluator().eval(clean_merged, adv_merged, num_samples=n)
        logger.info(
            "%s eps=%s src=%s tgt=%s: AR=%.2f%%",
            self.attack, self.eps, self.src_name, self.tgt_name, ar,
        )
        return {"AR": ar, "clean_file": clean_merged, "adv_file": adv_merged}


def main(argv=None):
    parser = standard_solver_argparser("robustart benchmark_eval_adv")
    parser.add_argument("--src_name", default=None)
    parser.add_argument("--src_path", default=None)
    parser.add_argument("--tgt_name", default=None)
    parser.add_argument("--tgt_path", default=None)
    parser.add_argument("--attack", default="pgd_linf", choices=list(ATTACKS) + ["autoattack_linf"])
    parser.add_argument("--eps", type=float, default=8.0)
    args = parser.parse_args(argv)
    solver = BenchmarkEvalAdvSolver(
        args.config, args.src_name, args.src_path, args.tgt_name,
        args.tgt_path, args.attack, args.eps,
    )
    return solver.evaluate()


if __name__ == "__main__":
    main()
