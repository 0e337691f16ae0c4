"""CIFAR training CLI (reference cifar10/code/train.py).

Same argparse surface: --dataset --lr --minlr --opt --wd --scheduler --aug
--net --bs --n_epochs --seed --path --advtrain --eps --steps --rel_stepsize
(reference train.py:26-44). Recipe: AdamW + cosine with 8-epoch gradual
warmup (train.py:84-92), optional PGD-Linf adversarial training generated in
eval mode inside the jitted step (replacing the foolbox denormalize→attack→
renormalize loop of train.py:104-111), checkpoint best + every 50 epochs,
adversarial eval every 50 epochs (train.py:185-204), durable text log
(train.py:206-211).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from robustart_tpu.attacks.gradient import pgd_linf
from robustart_tpu.cifar10.data import DATASET_STATS, iterate_batches, load_dataset
from robustart_tpu.cifar10.models import get_cifar_model
from robustart_tpu.core.logging import get_logger
from robustart_tpu.solvers.base import load_checkpoint, save_checkpoint

logger = get_logger("robustart.cifar10")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="CIFAR10 Training")
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--minlr", default=5e-6, type=float)
    parser.add_argument("--opt", default="adamW")
    parser.add_argument("--wd", default=0.01, type=float)
    parser.add_argument("--scheduler", default="warmup")
    parser.add_argument("--aug", default="autoaug")
    parser.add_argument("--net", default="vit")
    parser.add_argument("--bs", type=int, default=128)
    parser.add_argument("--n_epochs", type=int, default=100)
    parser.add_argument("--seed", default=34257, type=int)
    parser.add_argument("--path", default="./checkpoints")
    parser.add_argument("--advtrain", action="store_true")
    parser.add_argument("--eps", default=8 / 255, type=float)
    parser.add_argument("--steps", default=15, type=int)
    parser.add_argument("--rel_stepsize", default=0.1, type=float)
    return parser.parse_args(argv)


def warmup_cosine(lr, minlr, n_epochs, steps_per_epoch, warmup_epochs=8):
    warm = warmup_epochs * steps_per_epoch
    total = n_epochs * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = lr * (step + 1) / warm
        t = jnp.clip((step - warm) / max(total - warm, 1), 0.0, 1.0)
        c = minlr + 0.5 * (lr - minlr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warm, w, c)

    return schedule


def run(args) -> dict:
    mean, std, num_classes = DATASET_STATS[args.dataset]
    (train_x, train_y), (test_x, test_y) = load_dataset(args.dataset, args.data_dir)
    module = get_cifar_model(args.net, num_classes=num_classes)

    rng = jax.random.key(args.seed)
    variables = module.init(
        {"params": rng}, jnp.zeros((1, 32, 32, 3)), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    steps_per_epoch = max(len(train_x) // args.bs, 1)
    schedule = warmup_cosine(args.lr, args.minlr, args.n_epochs, steps_per_epoch)
    assert args.opt.lower() == "adamw", "reference recipe uses AdamW"
    tx = optax.adamw(schedule, weight_decay=args.wd)
    opt_state = tx.init(params)

    mean_a = jnp.asarray(mean).reshape(1, 1, 1, 3)
    std_a = jnp.asarray(std).reshape(1, 1, 1, 3)

    def normalize(x01):
        return (x01 - mean_a) / std_a

    def eval_logits(vs, x01):
        return module.apply(vs, normalize(x01), train=False)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images_u8, labels, rng):
        x01 = images_u8.astype(jnp.float32) / 255.0
        if args.advtrain:
            frozen = {"params": params}
            if batch_stats:
                frozen["batch_stats"] = batch_stats
            x01 = pgd_linf(
                eval_logits, frozen, x01, labels, rng,
                eps=args.eps, rel_stepsize=args.rel_stepsize, steps=args.steps,
            )

        def loss_fn(p):
            vs = {"params": p}
            if batch_stats:
                vs["batch_stats"] = batch_stats
                logits, updates = module.apply(
                    vs, normalize(x01), train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                return (
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels
                    ).mean(),
                    (logits, updates["batch_stats"]),
                )
            logits = module.apply(vs, normalize(x01), train=True,
                                  rngs={"dropout": rng})
            return (
                optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels
                ).mean(),
                (logits, batch_stats),
            )

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def test_step(params, batch_stats, images_u8, labels):
        vs = {"params": params}
        if batch_stats:
            vs["batch_stats"] = batch_stats
        logits = module.apply(vs, normalize(images_u8.astype(jnp.float32) / 255.0),
                              train=False)
        return jnp.argmax(logits, -1) == labels

    os.makedirs(args.path, exist_ok=True)
    watermark = f"{args.net}_lr{args.lr}_wd{args.wd}_epoch{args.n_epochs}"
    if args.advtrain:
        watermark += "_advtrain"
    log_path = osp.join(args.path, f"log_{watermark}.txt")
    best_acc = 0.0
    step = 0
    base_rng = jax.random.key(args.seed + 1)

    for epoch in range(1, args.n_epochs + 1):
        t0 = time.time()
        tr_loss = tr_acc = nb = 0
        for xb, yb in iterate_batches(
            train_x, train_y, args.bs, shuffle=True, seed=args.seed,
            epoch=epoch, aug=args.aug,
        ):
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state, xb, yb,
                jax.random.fold_in(base_rng, step),
            )
            step += 1
            nb += 1
            tr_loss += float(loss)
            tr_acc += float(acc)
        correct = total = 0
        for xb, yb in iterate_batches(test_x, test_y, args.bs):
            ok = np.asarray(test_step(params, batch_stats, xb, yb))
            correct += int(ok.sum())
            total += len(ok)
        acc = 100.0 * correct / total
        line = (
            f"epoch {epoch} loss {tr_loss / max(nb, 1):.4f} "
            f"train_acc {100 * tr_acc / max(nb, 1):.2f} test_acc {acc:.2f} "
            f"time {time.time() - t0:.1f}s"
        )
        logger.info(line)
        with open(log_path, "a") as f:
            f.write(line + "\n")
        variables_out = {"params": params}
        if batch_stats:
            variables_out["batch_stats"] = batch_stats
        if acc > best_acc:
            best_acc = acc
            save_checkpoint(
                osp.join(args.path, f"{watermark}_best.msgpack"),
                jax.device_get(variables_out), extra={"epoch": epoch, "acc": acc},
            )
        if epoch % 50 == 0:
            save_checkpoint(
                osp.join(args.path, f"{watermark}_e{epoch}.msgpack"),
                jax.device_get(variables_out), extra={"epoch": epoch, "acc": acc},
            )
    return {"best_acc": best_acc, "log": log_path, "watermark": watermark}


def main(argv=None):
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
