"""Shared eval helpers for the CIFAR test CLIs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.cifar10.data import DATASET_STATS
from robustart_tpu.cifar10.models import get_cifar_model
from robustart_tpu.solvers.base import load_checkpoint


def build_model(net: str, dataset: str = "cifar10", checkpoint: str | None = None,
                seed: int = 0):
    """Model + variables with the reference's multi-layout checkpoint
    tolerance (torch .pth via the converter, flax .msgpack natively)."""
    mean, std, num_classes = DATASET_STATS[dataset]
    module = get_cifar_model(net, num_classes=num_classes)
    variables = module.init(
        {"params": jax.random.key(seed)}, jnp.zeros((1, 32, 32, 3)), train=False
    )
    if checkpoint:
        if checkpoint.endswith((".pth", ".pth.tar", ".pt", ".bin")):
            from robustart_tpu.models.classifier import Classifier
            from robustart_tpu.models.torch_convert import load_torch_checkpoint

            clf = Classifier("cifar", module, variables, mean, std, 32, num_classes)
            variables = load_torch_checkpoint(checkpoint, clf)
        else:
            variables = load_checkpoint(checkpoint)["variables"]
    mean_a = jnp.asarray(mean).reshape(1, 1, 1, 3)
    std_a = jnp.asarray(std).reshape(1, 1, 1, 3)

    @jax.jit
    def logits_fn_01(vs, x01):
        return module.apply(vs, (x01 - mean_a) / std_a, train=False)

    return module, variables, logits_fn_01


def predict_dataset(logits_fn, variables, images_u8, batch_size=256):
    """argmax predictions over a uint8 (N, 32, 32, 3) array."""
    preds = []
    n = len(images_u8)
    for lo in range(0, n, batch_size):
        xb = images_u8[lo : lo + batch_size].astype(np.float32) / 255.0
        if len(xb) < batch_size:  # static shapes: pad + trim
            pad = batch_size - len(xb)
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            out = np.asarray(logits_fn(variables, xb))[: n - lo]
        else:
            out = np.asarray(logits_fn(variables, xb))
        preds.append(out.argmax(-1))
    return np.concatenate(preds)


def logits_dataset(logits_fn, variables, images_u8, batch_size=256):
    outs = []
    n = len(images_u8)
    for lo in range(0, n, batch_size):
        xb = images_u8[lo : lo + batch_size].astype(np.float32) / 255.0
        if len(xb) < batch_size:
            pad = batch_size - len(xb)
            xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            out = np.asarray(logits_fn(variables, xb))[: n - lo]
        else:
            out = np.asarray(logits_fn(variables, xb))
        outs.append(out)
    return np.concatenate(outs)
