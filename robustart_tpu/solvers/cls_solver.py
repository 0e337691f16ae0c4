"""``cls_solver`` — classification training + evaluation.

TPU-native equivalent of the reference's core solver
(``prototype.prototype.solver.cls_solver`` — usage: reference
README.md:114-121, exprs/robust_baseline_exp/resnet/resnet50/run.sh:2; API
surface reconstructed in SURVEY.md §2.9/§3.2). One YAML config drives both
training and eval (``--evaluate``), with ``--recover`` resume and
``--ckpt-filePath`` checkpoint selection.

Design: the whole train step — /255, mixup/cutmix, normalize, forward,
backward, optimizer, EMA — is ONE jitted XLA program over a batch-sharded
global array; gradient sync is the ``psum`` XLA inserts for the sharded
batch axis (replaces DDP allreduce + the ``dist.sync`` toggle, SURVEY.md
§2.11). BN runs global-batch statistics (= SyncBN).
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from robustart_tpu.core.config import Config
from robustart_tpu.core.dist import batch_sharding, get_mesh
from robustart_tpu.core.logging import get_logger
from robustart_tpu.data import build_dataloader
from robustart_tpu.metrics import ImageNetCEvaluator, ImageNetEvaluator
from robustart_tpu.solvers.base import (
    TORCH_CKPT_EXTS,
    ResultWriter,
    Solver,
    load_checkpoint,
    load_eval_variables,
    newest_checkpoint,
    save_checkpoint,
    standard_solver_argparser,
)
from robustart_tpu.solvers.optim import (
    build_optimizer,
    build_schedule,
    ema_update,
    mixup_cutmix,
    one_hot_smooth,
    smoothed_cross_entropy,
)

logger = get_logger("robustart.cls_solver")


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled


class ClsSolver(Solver):
    """Train/eval solver for image classification."""

    # ------------------------------------------------------------------ train
    def train(self, recover: str | None = None) -> None:
        cfg = self.cfg
        clf = self.build_model(seed=int(cfg.get("seed", 0)))
        data_cfg = cfg.data
        lr_kwargs = cfg.lr_scheduler.get("kwargs") or {}
        max_epoch = int(lr_kwargs.get("max_epoch", 100))

        loader0 = build_dataloader(
            data_cfg, "train", self.rank, self.world_size, epoch=0,
            seed=int(cfg.get("seed", 0)),
        )
        steps_per_epoch = len(loader0)
        max_iter = 0
        if "max_epoch" not in lr_kwargs and "max_iter" in lr_kwargs:
            # iteration-budgeted recipes (reference exp/models/.../config.yaml:
            # Step scheduler with max_iter 125000, no max_epoch) stop at
            # exactly max_iter steps, mid-epoch if needed
            max_iter = int(lr_kwargs["max_iter"])
            max_epoch = max(-(-max_iter // max(steps_per_epoch, 1)), 1)
        schedule = build_schedule(cfg.lr_scheduler, steps_per_epoch)
        tx = build_optimizer(cfg.optimizer, schedule)

        num_classes = clf.num_classes
        smoothing = float(cfg.get("label_smooth", 0.0) or 0.0)
        mixup_alpha = float(cfg.get("mixup", 0.0) or 0.0)
        cutmix_alpha = float(cfg.get("cutmix", 0.0) or 0.0)
        ema_cfg = cfg.get("ema") or {}
        ema_enabled = bool(ema_cfg.get("enable", False))
        ema_decay = float((ema_cfg.get("kwargs") or {}).get("decay", 0.9999))

        params = clf.variables["params"]
        batch_stats = clf.variables.get("batch_stats", {})
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema_enabled else {},
        )
        start_epoch = 0
        if recover:
            from flax import serialization

            if recover.endswith(TORCH_CKPT_EXTS):
                # foreign torch checkpoint: warm-start the weights (layout
                # tolerance {state_dict|model|net|raw} + module. strip,
                # reference cifar10/code/test_cifar_c.py:169-187); optimizer
                # state and epoch restart fresh
                ckpt_vars = load_eval_variables(recover, clf)
                state = state.replace(
                    params=ckpt_vars["params"],
                    batch_stats=ckpt_vars.get("batch_stats", state.batch_stats),
                    ema_params=(
                        jax.tree.map(jnp.copy, ckpt_vars["params"])
                        if ema_enabled else {}
                    ),
                )
                logger.info(
                    "recovered weights from torch checkpoint %s "
                    "(fresh optimizer state)", recover,
                )
            else:
                ckpt = load_checkpoint(recover)
                state = serialization.from_state_dict(
                    state, ckpt["extra"]["state"]
                )
                start_epoch = int(ckpt["extra"].get("epoch", 0))
                logger.info(
                    "recovered from %s at epoch %d", recover, start_epoch
                )

        module = clf.module
        mean, std = clf.mean, clf.std

        # reference `lms{enable, kwargs{limit}}` is GPU large-model-support
        # CPU offload (config_vit_base.yaml:37-40); the TPU-native equivalent
        # is rematerialization — trade recompute for HBM
        use_remat = bool((cfg.get("lms") or {}).get("enable", False))

        def apply_train(variables, x, rngs):
            fn = module.apply
            if use_remat:
                fn = jax.checkpoint(
                    lambda v, xx: module.apply(
                        v, xx, train=True, mutable=["batch_stats"], rngs=rngs
                    )
                    if "batch_stats" in variables
                    else module.apply(v, xx, train=True, rngs=rngs)
                )
                return fn(variables, x)
            if "batch_stats" in variables:
                return module.apply(
                    variables, x, train=True, mutable=["batch_stats"], rngs=rngs
                )
            return module.apply(variables, x, train=True, rngs=rngs)

        # adversarial training: generate attacks in eval mode INSIDE the same
        # jitted step (reference adv_cls_solver_train_pgd; the CIFAR mirror's
        # denormalize→attack→renormalize dance at cifar10/code/train.py:104-111
        # disappears because attacks operate in [0,1] natively here)
        adv_cfg = cfg.get("adv_train") or {}
        adv_enabled = bool(adv_cfg.get("enable", False))
        if adv_enabled:
            from robustart_tpu.attacks import ATTACKS

            adv_attack = ATTACKS[adv_cfg.get("attack", "pgd_linf")]
            adv_kwargs = dict(adv_cfg.get("kwargs") or {})

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, images_u8, labels, rng):
            x = images_u8.astype(jnp.float32) / 255.0
            soft = one_hot_smooth(labels, num_classes, smoothing)
            rng_mix, rng_drop, rng_adv = jax.random.split(rng, 3)
            if adv_enabled:
                frozen = {"params": state.params}
                if state.batch_stats:
                    frozen["batch_stats"] = state.batch_stats

                def eval_logits(variables, img01):
                    xin = (img01 - jnp.asarray(mean).reshape(1, 1, 1, -1)) / (
                        jnp.asarray(std).reshape(1, 1, 1, -1)
                    )
                    return module.apply(variables, xin, train=False)

                x = adv_attack(eval_logits, frozen, x, labels, rng_adv,
                               **adv_kwargs)
            x, soft = mixup_cutmix(rng_mix, x, soft, mixup_alpha, cutmix_alpha)
            mean_a = jnp.asarray(mean).reshape(1, 1, 1, -1)
            std_a = jnp.asarray(std).reshape(1, 1, 1, -1)
            x = (x - mean_a) / std_a

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    out, updates = apply_train(
                        variables, x, {"dropout": rng_drop}
                    )
                    new_stats = updates["batch_stats"]
                else:
                    out = apply_train(variables, x, {"dropout": rng_drop})
                    new_stats = state.batch_stats
                return smoothed_cross_entropy(out, soft), (out, new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p + u, state.params, updates
            )
            new_ema = (
                ema_update(state.ema_params, new_params, ema_decay)
                if ema_enabled
                else {}
            )
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                ema_params=new_ema,
            )
            return new_state, {"loss": loss, "acc": acc,
                               "lr": schedule(state.step)}

        saver = cfg.get("saver") or {}
        print_freq = int(saver.get("print_freq", 10))
        val_freq = int(saver.get("val_freq", steps_per_epoch))
        save_many = bool(saver.get("save_many", False))
        save_dir = saver.get("save_dir", "checkpoints")
        base_rng = jax.random.key(int(cfg.get("seed", 0)) + 1)

        # Training runs on the GLOBAL mesh: with multi-process
        # jax.distributed the per-process loader shards feed one logical
        # global batch (make_array_from_process_local_data) and the gradient
        # psum spans every chip — the reference's 16-rank DDP allreduce
        # (resnet50/run.sh:2) as sharding (SURVEY.md §2.11, §5.8)
        from jax.sharding import NamedSharding, PartitionSpec

        tp = self.tensor_parallel
        n_global = jax.device_count()
        if tp > 1:
            # (data, model) mesh: dense kernels shard over `model`
            # (parallel/sharding.py tp rules), batch over `data`
            train_mesh = get_mesh(
                ("data", "model"), mesh_shape=(n_global // tp, tp)
            )
        else:
            train_mesh = get_mesh(("data",))
        multiproc = self.world_size > 1

        def put_batch(arr, ndim):
            sh = batch_sharding(train_mesh, ndim)
            if multiproc:
                return jax.make_array_from_process_local_data(sh, np.asarray(arr))
            return jax.device_put(arr, sh)

        if multiproc or tp > 1:
            from robustart_tpu.parallel.sharding import tp_param_spec

            def leaf_sharding(path, v):
                spec = PartitionSpec()
                if tp > 1 and np.ndim(v) > 0:
                    spec = tp_param_spec(path, v)
                return NamedSharding(train_mesh, spec)

            def put_leaf(path, v):
                sh = leaf_sharding(path, v)
                if multiproc:
                    # every process holds the full leaf; its addressable
                    # shards are sub-slices of it (tp ≤ local devices)
                    return jax.make_array_from_process_local_data(
                        sh, np.asarray(v)
                    )
                return jax.device_put(v, sh)

            state = jax.tree_util.tree_map_with_path(put_leaf, state)

        def to_host(tree):
            """Host copy of a (possibly model-sharded) pytree. Under
            multi-process TP, model-axis-sharded leaves span non-addressable
            devices — gather to replicated first (a collective: every rank
            must call this)."""
            if multiproc and tp > 1:
                rep = NamedSharding(train_mesh, PartitionSpec())
                tree = jax.jit(
                    lambda t: t,
                    out_shardings=jax.tree.map(lambda _: rep, tree),
                )(tree)
            return jax.device_get(tree)

        # scalar training-history artifact (the reference logged curves via
        # tensorboardx inside the missing solver, reference
        # requirements.txt:11; a JSONL of step scalars is the durable
        # file-based equivalent of that observability)
        history_f = None
        if self.rank == 0:
            os.makedirs(save_dir, exist_ok=True)
            history_f = open(osp.join(save_dir, "train_history.jsonl"), "a")

        step = int(state.step)
        stop = False
        for epoch in range(start_epoch, max_epoch):
            loader = (
                loader0
                if epoch == 0
                else build_dataloader(
                    data_cfg, "train", self.rank, self.world_size,
                    epoch=epoch, seed=int(cfg.get("seed", 0)),
                )
            )
            t0 = time.time()
            for batch in loader:
                images = put_batch(batch.image, 4)
                labels = put_batch(batch.label, 1)
                state, metrics = train_step(
                    state, images, labels, jax.random.fold_in(base_rng, step)
                )
                step += 1
                if step % print_freq == 0:
                    m = jax.device_get(metrics)
                    logger.info(
                        "epoch %d step %d loss %.4f acc %.3f lr %.5f (%.1f img/s)",
                        epoch, step, m["loss"], m["acc"], m["lr"],
                        print_freq * batch.image.shape[0] / max(time.time() - t0, 1e-9),
                    )
                    if history_f is not None:
                        history_f.write(json.dumps({
                            "step": step, "epoch": epoch,
                            "loss": float(m["loss"]), "acc": float(m["acc"]),
                            "lr": float(m["lr"]), "time": time.time(),
                        }) + "\n")
                        history_f.flush()
                    t0 = time.time()
                if step % val_freq == 0:
                    self._save_train_ckpt(
                        state, epoch, save_dir, save_many, step, to_host
                    )
                if max_iter and step >= max_iter:
                    stop = True
                    break
            self._save_train_ckpt(
                state, epoch + 1, save_dir, save_many, step, to_host
            )
            if stop:
                break
        if history_f is not None:
            history_f.close()
        # leave the trained weights on the classifier for immediate eval
        host = to_host({"params": state.params,
                        "batch_stats": state.batch_stats,
                        "ema_params": state.ema_params})
        variables = {"params": host["params"]}
        if state.batch_stats:
            variables["batch_stats"] = host["batch_stats"]
        self.classifier.variables = variables
        self._ema_params_host = host["ema_params"] if ema_enabled else None
        self._train_state = state

    def _save_train_ckpt(self, state, epoch, save_dir, save_many, step,
                         to_host=jax.device_get):
        # to_host runs on EVERY rank (gathering model-sharded leaves is a
        # collective under multi-process TP); only rank 0 writes
        host_state = to_host(
            {
                "step": state.step,
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "ema_params": state.ema_params,
            }
        )
        if self.rank != 0:
            return
        variables = {"params": host_state["params"]}
        if host_state["batch_stats"]:
            variables["batch_stats"] = host_state["batch_stats"]
        name = f"ckpt_e{epoch}.msgpack" if save_many else "ckpt.msgpack"
        save_checkpoint(
            osp.join(save_dir, name), variables,
            extra={"state": host_state, "epoch": epoch, "step": step},
        )

    # ------------------------------------------------------------------- eval
    def evaluate(self, ckpt_path: str | None = None,
                 results_path: str | None = None) -> dict:
        cfg = self.cfg
        use_ema = cfg.get_path("model.use_ema")
        if self.classifier is None:
            self.build_model(seed=int(cfg.get("seed", 0)))
        if ckpt_path:
            if osp.isdir(ckpt_path):
                ckpt_path = newest_checkpoint(ckpt_path)
            # tolerant of foreign torch layouts ({state_dict|model|net|raw}
            # + module. strip) like the reference's own resume path
            # (reference cifar10/code/test_cifar_c.py:169-187)
            self.classifier.variables = load_eval_variables(
                ckpt_path, self.classifier, use_ema
            )
        elif use_ema is not False and getattr(self, "_ema_params_host", None):
            # post-train eval on an EMA-trained run defaults to the EMA copy
            # (reference ema technique axis,
            # exprs/nips_benchmark/ema/resnet50/config.yaml:30-32)
            variables = dict(self.classifier.variables)
            variables["params"] = self._ema_params_host
            self.classifier.variables = variables
            logger.info("eval: using EMA weights from the training run")

        loader = build_dataloader(
            cfg.data, "test", self.rank, self.world_size,
            seed=int(cfg.get("seed", 0)),
        )
        results_path = results_path or cfg.get_path(
            "saver.results_path", "results/results.txt.all"
        )
        self.maybe_quantize(loader)
        writer = ResultWriter(results_path, self.rank, self.world_size)
        self.run_eval_loop(
            loader, writer,
            limit_samples=cfg.get_path("data.test.limit_samples"),
        )
        writer.close()
        merged = writer.merge()
        if self.rank != 0:
            return {}

        ev_cfg = cfg.get_path("data.test.evaluator") or Config(
            {"type": "imagenet", "kwargs": {"topk": [1, 5]}}
        )
        ev_type = ev_cfg.get("type", "imagenet")
        kwargs = dict(ev_cfg.get("kwargs") or {})
        evaluator = (
            ImageNetCEvaluator(**kwargs)
            if ev_type == "imagenetc"
            else ImageNetEvaluator(**kwargs)
        )
        metric = evaluator.eval(merged)
        logger.info("eval metric: %s", metric)
        return dict(metric.metric)


def main(argv=None):
    parser = standard_solver_argparser("robustart cls_solver")
    args = parser.parse_args(argv)
    from robustart_tpu.core.config import iter_eval_list, load_config

    cfg = load_config(args.config)
    if args.evaluate and cfg.get("eval_list"):
        # batch evaluation of many checkpoints from one config (reference
        # README.md:70-91, exprs/exp/swin/config.yaml:8-10)
        results = []
        for i, sub in enumerate(iter_eval_list(cfg)):
            sub.setdefault("saver", {})
            sub.saver.results_path = sub.get_path(
                "saver.results_path", f"results/eval_{i}/results.txt.all"
            )
            solver = ClsSolver(sub, evaluate_only=True)
            results.append(solver.evaluate(ckpt_path=args.ckpt_filePath))
        return results
    solver = ClsSolver(cfg, evaluate_only=args.evaluate)
    if args.evaluate:
        return solver.evaluate(ckpt_path=args.ckpt_filePath)
    solver.train(recover=args.recover)
    return solver.evaluate()


if __name__ == "__main__":
    main()
