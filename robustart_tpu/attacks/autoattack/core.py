"""AutoAttack — the parameter-free ensemble cascade.

API-compatible re-implementation of the reference's vendored AutoAttack
(reference RobustART/noise/utils/adv/Attacks/autoattack/autoattack.py:26-284):
``AutoAttack(model, norm, eps, version).run_standard_evaluation(x, y, bs)``
with versions:

- standard: APGD-CE (1 restart, 100 it) → APGD-T (9 target classes) →
  FAB-T (9 targets) → Square (5000 queries)   (autoattack.py:253-267)
- rand:     APGD-CE + APGD-DLR with EOT 20    (autoattack.py:268-275)
- plus:     adds APGD-DLR and more restarts   (autoattack.py:276-284)

Differences by design (TPU-native):

- ``model`` is a robustart_tpu Classifier consuming NHWC [0,1] batches; its
  internal normalization replaces the reference's hard-coded NormalizeModel
  wrap (autoattack.py:12-23).
- The shrinking worklist ("attack only still-robust points",
  autoattack.py:116-137) is expressed as per-sample masking over
  static-shaped batches, so each cascade stage is one jitted XLA program and
  nothing recompiles as the robust set shrinks (SURVEY.md §7 hard-part #2).
- The reference's final perturbation-norm/NaN sanity check
  (autoattack.py:199-209) is kept.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.attacks.autoattack.apgd import (
    apgd_attack,
    apgd_attack_largereps,
)
from robustart_tpu.attacks.autoattack.fab import fab_attack_targeted
from robustart_tpu.attacks.autoattack.square import (
    square_attack_l1,
    square_attack_l2,
    square_attack_linf,
)
from robustart_tpu.core.logging import get_logger

logger = get_logger("robustart.autoattack")


class AutoAttack:
    def __init__(
        self,
        model,
        norm: str = "Linf",
        eps: float = 8 / 255,
        version: str = "standard",
        verbose: bool = False,
        seed: int | None = None,
        attacks_to_run: list[str] | None = None,
        n_iter: int = 100,
        n_target_classes: int = 9,
        square_n_queries: int = 5000,
        mesh=None,
        data_axis: str = "data",
    ):
        # reference autoattack.py:32 accepts Linf/L2/L1
        assert norm in ("Linf", "L2", "L1"), norm
        self.model = model
        self.norm = norm
        self.eps = float(eps)
        self.version = version
        self.verbose = verbose
        self.seed = seed if seed is not None else 0
        self.n_iter = n_iter
        self.n_target_classes = n_target_classes
        self.square_n_queries = square_n_queries

        # L1 `standard` follows the reference's set_version
        # (autoattack.py:258-262): the largereps 3ε→2ε→ε schedule, 5 APGD
        # restarts, 5 target classes
        self.use_largereps = False
        if attacks_to_run is not None:
            self.attacks_to_run = list(attacks_to_run)
        elif version == "standard":
            self.attacks_to_run = ["apgd-ce", "apgd-t", "fab-t", "square"]
            self.apgd_n_restarts = 1
            self.eot_iter = 1
            if norm == "L1":
                self.use_largereps = True
                self.apgd_n_restarts = 5
                self.n_target_classes = min(n_target_classes, 5)
        elif version == "rand":
            self.attacks_to_run = ["apgd-ce", "apgd-dlr"]
            self.apgd_n_restarts = 1
            self.eot_iter = 20
        elif version == "plus":
            # reference plus set (autoattack.py:276-284)
            self.attacks_to_run = ["apgd-ce", "apgd-dlr", "fab", "square",
                                   "apgd-t", "fab-t"]
            self.apgd_n_restarts = 5
            self.eot_iter = 1
        else:
            raise ValueError(f"unknown version {version!r}")
        if not hasattr(self, "apgd_n_restarts"):
            self.apgd_n_restarts = 1
            self.eot_iter = 1

        self._logits_fn = lambda variables, img: model.apply_fn(
            variables, img, train=False
        )
        # Data-parallel attack generation: the reference runs its adversarial
        # benchmark 8-GPU data-parallel (reference exprs/nips_benchmark/
        # batch_eval_adv/eval.sh). Here a mesh shards every cascade-stage
        # batch over `data_axis`; the jitted attack programs then run SPMD
        # with XLA-inserted collectives. The host-side masked-worklist
        # orchestration is untouched (it is per-sample and order-free).
        # Equivalence with the single-device cascade is asserted by
        # tests/test_parallel.py and __graft_entry__ phase 4.
        self.mesh = mesh
        self.data_axis = data_axis

    def _put(self, arr):
        """Device-put with batch-dim sharding when a mesh is configured."""
        arr = jnp.asarray(arr)
        if self.mesh is None:
            return arr
        n_dev = int(np.prod(
            [self.mesh.shape[a] for a in (self.data_axis,)
             if a in self.mesh.shape]
        ))
        if n_dev <= 1 or arr.shape[0] % n_dev:
            # ragged tail (e.g. a final clean-pass chunk): replicate rather
            # than fail — the worklist keeps attack chunks bs-sized/static
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.data_axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # -- helpers --
    def _predict(self, x) -> np.ndarray:
        return np.asarray(
            jnp.argmax(self._logits_fn(self.model.variables, self._put(x)), 1)
        )

    def clean_accuracy(self, x, y, bs: int = 250) -> float:
        """(reference autoattack.py:213-225)"""
        x = np.asarray(x)
        y = np.asarray(y)
        correct = 0
        for lo in range(0, x.shape[0], bs):
            pred = self._predict(x[lo : lo + bs])
            correct += int((pred == y[lo : lo + bs]).sum())
        return correct / x.shape[0]

    def _ranked_targets(self, x, y, rank: int) -> np.ndarray:
        """target class = (rank+2)-th most probable class (rank 0 → 2nd)."""
        logits = np.asarray(self._logits_fn(self.model.variables, self._put(x)))
        order = np.argsort(-logits, axis=1)
        # skip the true class when it tops the ranking
        targets = np.empty(x.shape[0], np.int32)
        for i in range(x.shape[0]):
            cand = [c for c in order[i] if c != y[i]]
            targets[i] = cand[min(rank, len(cand) - 1)]
        return targets

    # -- cascade --
    def run_standard_evaluation(
        self, x, y, bs: int = 250, attacks_to_run: list[str] | None = None
    ) -> np.ndarray:
        attacks = (
            self.attacks_to_run if attacks_to_run is None else attacks_to_run
        )
        x = np.asarray(x, np.float32)
        y = np.asarray(y)
        n = x.shape[0]
        x_adv = x.copy()
        t_start = time.time()

        # clean pass → robust flags (reference autoattack.py:95-109)
        robust = np.zeros(n, bool)
        for lo in range(0, n, bs):
            pred = self._predict(x[lo : lo + bs])
            robust[lo : lo + bs] = pred == y[lo : lo + bs]
        if self.verbose:
            logger.info("initial accuracy: %.2f%%", 100 * robust.mean())

        key = jax.random.key(self.seed)
        for attack in attacks:
            if not robust.any():
                break
            t0 = time.time()
            # worklist compaction: gather still-robust samples into dense
            # bs-sized chunks (pad the tail by repetition) so late cascade
            # stages pay only for surviving samples while shapes stay static
            # — the XLA-friendly form of the reference's shrinking index set
            # (autoattack.py:116-137; SURVEY.md §7 hard-part #2)
            idx_robust = np.nonzero(robust)[0]
            for lo in range(0, len(idx_robust), bs):
                sel = idx_robust[lo : lo + bs]
                # ALWAYS pad to bs (repeat the last index): every cascade
                # stage then runs at one static shape — no recompiles as the
                # robust set shrinks, and DP-mesh sharding never sees a
                # ragged chunk (bs is validated divisible below)
                pad = min(bs, n) - len(sel)
                sel_p = (
                    np.concatenate([sel, np.repeat(sel[-1:], pad)])
                    if pad
                    else sel
                )
                key, sub = jax.random.split(key)
                x_try = self._run_one(attack, x[sel_p], y[sel_p], sub)
                pred = self._predict(x_try)[: len(sel)]
                x_try = x_try[: len(sel)]
                newly_broken = pred != y[sel]
                # sanity: stay inside the eps-ball, no NaNs (reference
                # autoattack.py:199-209)
                delta = x_try - x[sel]
                if self.norm == "Linf":
                    norms = np.abs(delta).reshape(len(sel), -1).max(1)
                elif self.norm == "L1":
                    norms = np.abs(delta).reshape(len(sel), -1).sum(1)
                else:
                    norms = np.sqrt((delta.reshape(len(sel), -1) ** 2).sum(1))
                ok = (norms <= self.eps * 1.001) & np.isfinite(
                    x_try.reshape(len(sel), -1)
                ).all(1)
                accept = newly_broken & ok
                idx = sel[accept]
                x_adv[idx] = x_try[accept]
                robust[idx] = False
            if self.verbose:
                logger.info(
                    "%s done in %.1fs — robust accuracy %.2f%%",
                    attack, time.time() - t0, 100 * robust.mean(),
                )
        if self.verbose:
            logger.info(
                "AutoAttack (%s) finished in %.1fs: robust accuracy %.2f%%",
                self.version, time.time() - t_start, 100 * robust.mean(),
            )
        return x_adv

    def run_standard_evaluation_individual(self, x, y, bs: int = 250) -> dict:
        """Per-attack adversarial sets (reference autoattack.py:227-247).

        Reentrant: does not mutate ``self.attacks_to_run``."""
        return {
            attack: self.run_standard_evaluation(
                x, y, bs=bs, attacks_to_run=[attack]
            )
            for attack in self.attacks_to_run
        }

    def _run_one(self, attack: str, x, y, key) -> np.ndarray:
        fn = self._logits_fn
        variables = self.model.variables
        xj = self._put(x)
        yj = self._put(y)
        largereps = self.use_largereps and self.norm == "L1"

        def _apgd(xa, ya, k, *, loss, targets=None):
            if largereps:
                return apgd_attack_largereps(
                    fn, variables, xa, ya, k, eps=self.eps, loss=loss,
                    n_iter=self.n_iter, targets=targets,
                    eot_iter=self.eot_iter,
                )
            return apgd_attack(
                fn, variables, xa, ya, k, eps=self.eps, norm=self.norm,
                loss=loss, n_iter=self.n_iter, targets=targets,
                eot_iter=self.eot_iter,
            )

        if attack == "apgd-ce":
            best = None
            best_f = None
            for r in range(self.apgd_n_restarts):
                x_try, f = _apgd(xj, yj, jax.random.fold_in(key, r), loss="ce")
                if best is None:
                    best, best_f = x_try, f
                else:
                    better = (f > best_f).reshape((-1,) + (1,) * (x.ndim - 1))
                    best = jnp.where(better, x_try, best)
                    best_f = jnp.maximum(f, best_f)
            return np.asarray(best)
        if attack == "apgd-dlr":
            x_try, _ = apgd_attack(
                fn, variables, xj, yj, key,
                eps=self.eps, norm=self.norm, loss="dlr",
                n_iter=self.n_iter, eot_iter=self.eot_iter,
            )
            return np.asarray(x_try)
        if attack == "apgd-t":
            # keep the first successful target's example per sample
            x_out = np.asarray(x).copy()
            fooled = np.zeros(x.shape[0], bool)
            for rank in range(self.n_target_classes):
                targets = self._ranked_targets(x, y, rank)
                x_try, _ = _apgd(
                    xj, yj, jax.random.fold_in(key, 100 + rank),
                    loss="dlr-targeted", targets=self._put(targets),
                )
                x_try = np.asarray(x_try)
                pred = self._predict(x_try)
                new = (pred != y) & ~fooled
                x_out[new] = x_try[new]
                fooled |= new
                if fooled.all():
                    break
            return x_out
        if attack == "fab":
            # untargeted FAB: per-iteration closest-boundary class
            x_try, norms = fab_attack_targeted(
                fn, variables, xj, yj, yj,  # targets unused when untargeted
                key, eps=self.eps, norm=self.norm, n_iter=self.n_iter,
                untargeted=True,
            )
            return np.asarray(x_try)
        if attack == "fab-t":
            x_out = np.asarray(x).copy()
            best_norm = np.full(x.shape[0], np.inf)
            for rank in range(self.n_target_classes):
                targets = self._ranked_targets(x, y, rank)
                x_try, norms = fab_attack_targeted(
                    fn, variables, xj, yj, self._put(targets),
                    jax.random.fold_in(key, 200 + rank),
                    eps=self.eps, norm=self.norm, n_iter=self.n_iter,
                )
                x_try, norms = np.asarray(x_try), np.asarray(norms)
                better = norms < best_norm
                x_out[better] = x_try[better]
                best_norm = np.minimum(best_norm, norms)
            return x_out
        if attack == "square":
            square = {
                "Linf": square_attack_linf,
                "L2": square_attack_l2,
                "L1": square_attack_l1,
            }[self.norm]
            return np.asarray(
                square(
                    fn, variables, xj, yj, key,
                    eps=self.eps, n_queries=self.square_n_queries,
                )
            )
        raise ValueError(f"unknown attack {attack!r}")
