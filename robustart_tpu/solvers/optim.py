"""Optimizers, LR schedules, EMA, mixup/cutmix, label smoothing.

Implements the reference config vocabulary (SURVEY.md §2.7):
- ``optimizer{type ∈ {SGD, AdamW, Adam}, kwargs, no_wd}`` — ``no_wd`` excludes
  biases and norm params from weight decay (reference
  new_adv_train/vit_base/config.yaml:11-15);
- ``lr_scheduler{type ∈ {CosineEpoch, StepEpoch}, kwargs{base_lr, warmup_lr,
  warmup_epoch, max_epoch, min_lr | lr_epochs, lr_mults}}`` (reference
  resnet50/config.yaml:16-27);
- ``label_smooth`` (0.1), ``mixup`` (alpha), ``cutmix`` (alpha) (reference
  nips_benchmark/augmentation/resnet50/config.yaml:30-31);
- ``ema{enable, kwargs{decay}}`` (decay .9999, resnet50/config.yaml:30-32).

Everything on-device: mixup/cutmix permute and blend inside the jitted train
step (no host RNG in the hot loop).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


# -- LR schedules -------------------------------------------------------------


def cosine_epoch_schedule(
    base_lr: float,
    warmup_lr: float,
    warmup_epoch: float,
    max_epoch: float,
    min_lr: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Linear warmup base_lr→warmup_lr over warmup_epoch, cosine decay
    warmup_lr→min_lr until max_epoch (reference CosineEpoch)."""
    warmup_steps = max(int(warmup_epoch * steps_per_epoch), 1)
    total_steps = max(int(max_epoch * steps_per_epoch), warmup_steps + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr + (warmup_lr - base_lr) * (step / warmup_steps)
        t = jnp.clip(
            (step - warmup_steps) / (total_steps - warmup_steps), 0.0, 1.0
        )
        cos = min_lr + 0.5 * (warmup_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_epoch_schedule(
    base_lr: float,
    lr_epochs: list[float],
    lr_mults: list[float],
    steps_per_epoch: int,
    warmup_lr: float | None = None,
    warmup_epoch: float = 0.0,
) -> optax.Schedule:
    """Piecewise-constant decay at epoch boundaries (reference StepEpoch)."""
    boundaries = [int(e * steps_per_epoch) for e in lr_epochs]
    peak = warmup_lr if warmup_lr is not None else base_lr
    warmup_steps = max(int(warmup_epoch * steps_per_epoch), 0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(peak, jnp.float32)
        for b, m in zip(boundaries, lr_mults):
            lr = jnp.where(step >= b, lr * m, lr)
        if warmup_steps > 0:
            warm = base_lr + (peak - base_lr) * (step / warmup_steps)
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return schedule


def build_schedule(lr_cfg, steps_per_epoch: int) -> optax.Schedule:
    kind = lr_cfg.get("type", "CosineEpoch")
    kw = dict(lr_cfg.get("kwargs") or {})
    if kind == "CosineEpoch":
        return cosine_epoch_schedule(
            base_lr=float(kw.get("base_lr", 0.1)),
            warmup_lr=float(kw.get("warmup_lr", kw.get("base_lr", 0.1))),
            warmup_epoch=float(kw.get("warmup_epoch", 0)),
            max_epoch=float(kw.get("max_epoch", 100)),
            min_lr=float(kw.get("min_lr", 0.0)),
            steps_per_epoch=steps_per_epoch,
        )
    if kind == "StepEpoch":
        return step_epoch_schedule(
            base_lr=float(kw.get("base_lr", 0.1)),
            lr_epochs=list(kw.get("lr_epochs", [30, 60, 90])),
            lr_mults=list(kw.get("lr_mults", [0.1, 0.1, 0.1])),
            steps_per_epoch=steps_per_epoch,
            warmup_lr=kw.get("warmup_lr"),
            warmup_epoch=float(kw.get("warmup_epoch", 0)),
        )
    if kind == "Step":
        # iteration-based variant (reference
        # exprs/exp/models/resnet18_batch1k_epoch100_nesterov_wd0.0001/
        # config.yaml:18-26: lr_steps/lr_mults + warmup_steps/max_iter)
        boundaries = [int(s) for s in kw.get("lr_steps", [])]
        mults = list(kw.get("lr_mults", [0.1] * len(boundaries)))
        if len(mults) != len(boundaries):
            raise ValueError(
                f"lr_mults has {len(mults)} entries for "
                f"{len(boundaries)} lr_steps"
            )
        base_lr = float(kw.get("base_lr", 0.1))
        peak = float(kw.get("warmup_lr", base_lr))
        warmup_steps = int(kw.get("warmup_steps", 0))

        def schedule(step):
            step = jnp.asarray(step, jnp.float32)
            lr = jnp.asarray(peak, jnp.float32)
            for b, m in zip(boundaries, mults):
                lr = jnp.where(step >= b, lr * m, lr)
            if warmup_steps > 0:
                warm = base_lr + (peak - base_lr) * (step / warmup_steps)
                lr = jnp.where(step < warmup_steps, warm, lr)
            return lr

        return schedule
    raise ValueError(f"unknown lr_scheduler type {kind!r}")


# -- optimizers ---------------------------------------------------------------


def _no_wd_mask(params) -> Any:
    """True = apply weight decay. Excludes 1-D params (biases, norm scales)
    — the reference's ``no_wd: fc/norm`` behavior generalized."""
    return jax.tree.map(lambda p: jnp.ndim(p) > 1, params)


def build_optimizer(opt_cfg, schedule: optax.Schedule) -> optax.GradientTransformation:
    kind = (opt_cfg.get("type") or "SGD").lower()
    kw = dict(opt_cfg.get("kwargs") or {})
    wd = float(kw.pop("weight_decay", 0.0))
    no_wd = bool(opt_cfg.get("no_wd", False))
    kw.pop("lr", None), kw.pop("base_lr", None)

    if kind == "sgd":
        tx = optax.sgd(
            learning_rate=schedule,
            momentum=float(kw.get("momentum", 0.9)),
            nesterov=bool(kw.get("nesterov", False)),
        )
        if wd:
            decay = optax.add_decayed_weights(
                wd, mask=_no_wd_mask if no_wd else None
            )
            tx = optax.chain(decay, tx)
        return tx
    if kind == "adamw":
        return optax.adamw(
            learning_rate=schedule,
            b1=float(kw.get("betas", [0.9, 0.999])[0]),
            b2=float(kw.get("betas", [0.9, 0.999])[1]),
            eps=float(kw.get("eps", 1e-8)),
            weight_decay=wd,
            mask=_no_wd_mask if no_wd else None,
        )
    if kind == "adam":
        return optax.adam(
            learning_rate=schedule,
            b1=float(kw.get("betas", [0.9, 0.999])[0]),
            b2=float(kw.get("betas", [0.9, 0.999])[1]),
        )
    raise ValueError(f"unknown optimizer type {kind!r}")


# -- losses + batch augmentation ----------------------------------------------


def smoothed_cross_entropy(logits, soft_labels) -> jax.Array:
    return optax.softmax_cross_entropy(logits, soft_labels).mean()


def one_hot_smooth(labels, num_classes: int, smoothing: float = 0.0) -> jax.Array:
    oh = jax.nn.one_hot(labels, num_classes)
    if smoothing > 0:
        oh = oh * (1.0 - smoothing) + smoothing / num_classes
    return oh


def mixup_cutmix(
    key: jax.Array,
    images: jax.Array,
    soft_labels: jax.Array,
    mixup_alpha: float = 0.0,
    cutmix_alpha: float = 0.0,
):
    """On-device mixup / cutmix: when both are enabled, picks one per batch
    with probability 1/2 (timm-style switching, matching the reference's
    augmentation recipe mixup 0.2 + cutmix 1.0)."""
    if mixup_alpha <= 0 and cutmix_alpha <= 0:
        return images, soft_labels
    k_perm, k_lam_mix, k_lam_cut, k_switch, k_pos = jax.random.split(key, 5)
    perm = jax.random.permutation(k_perm, images.shape[0])
    images_p = images[perm]
    labels_p = soft_labels[perm]

    h, w = images.shape[1], images.shape[2]

    def do_mixup():
        lam = jax.random.beta(k_lam_mix, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else 1.0
        mixed = lam * images + (1 - lam) * images_p
        return mixed, lam * soft_labels + (1 - lam) * labels_p

    def do_cutmix():
        lam = jax.random.beta(k_lam_cut, cutmix_alpha, cutmix_alpha) if cutmix_alpha > 0 else 1.0
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * ratio).astype(jnp.int32)
        cut_w = (w * ratio).astype(jnp.int32)
        cy = jax.random.randint(k_pos, (), 0, h)
        cx = jax.random.randint(jax.random.fold_in(k_pos, 1), (), 0, w)
        y0 = jnp.clip(cy - cut_h // 2, 0, h)
        y1 = jnp.clip(cy + cut_h // 2, 0, h)
        x0 = jnp.clip(cx - cut_w // 2, 0, w)
        x1 = jnp.clip(cx + cut_w // 2, 0, w)
        yy = jnp.arange(h)[None, :, None, None]
        xx = jnp.arange(w)[None, None, :, None]
        box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))
        mixed = jnp.where(box, images_p, images)
        lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
        return mixed, lam_adj * soft_labels + (1 - lam_adj) * labels_p

    if mixup_alpha > 0 and cutmix_alpha > 0:
        use_mix = jax.random.bernoulli(k_switch, 0.5)
        img_m, lab_m = do_mixup()
        img_c, lab_c = do_cutmix()
        images_out = jnp.where(use_mix, img_m, img_c)
        labels_out = jnp.where(use_mix, lab_m, lab_c)
        return images_out, labels_out
    if mixup_alpha > 0:
        return do_mixup()
    return do_cutmix()


# -- EMA ----------------------------------------------------------------------


def ema_update(ema_params, new_params, decay: float):
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, new_params
    )
