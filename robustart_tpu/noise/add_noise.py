"""``AddNoise`` — the single facade over all 8 noise types.

API-compatible re-implementation of the reference facade
(reference RobustART/noise/add_noise.py:5-42 and
add_noise_utils.py:7-50): same ``noise_list``, same per-type
``default_config`` dicts (including every default value), same
``set_config(**kwargs)`` key validation, same ``add_noise(image, label)``
dispatch rules (file-path input only for imagenet-s / imagenet-c).

Differences by design (TPU-native):
- adversarial noise types take a ``model`` / ``f_model`` that is a
  :class:`robustart_tpu.models.Classifier` (JAX) instead of a torch module,
  and batches are NHWC [0,1] arrays instead of NCHW CUDA tensors;
- imagenet-c accepts batches of any size and runs them on-device in one
  jitted call instead of a per-image PIL loop;
- an optional ``seed`` argument on ``add_noise`` gives reproducible noise.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from robustart_tpu.attacks import ATTACKS
from robustart_tpu.noise.corruptions import corrupt, corrupt_batch
from robustart_tpu.noise.imagenet_s import add_noise_for_imagenet_s

noise_list = [
    "imagenet-s",
    "imagenet-c",
    "pgd_linf",
    "pgd_l2",
    "fgsm",
    "autoattack_linf",
    "mim_linf",
    "pgd_l1",
]

# default_config values mirror reference add_noise_utils.py:9-18 exactly
default_config: dict[str, dict[str, Any]] = {
    "imagenet-s": {
        "decoder_type": "pil",
        "resize_type": "pil-bilinear",
        "transform_type": "val",
    },
    "imagenet-c": {"severity": 1, "corruption_name": None, "corruption_number": -1},
    "pgd_linf": {"f_model": None, "eps": 8 / 255, "rel_stepsize": 3 / 40, "steps": 20},
    "pgd_l2": {"f_model": None, "eps": 8.0, "rel_stepsize": 3 / 40, "steps": 20},
    "fgsm": {"f_model": None, "eps": 8 / 255},
    "autoattack_linf": {
        "model": None,
        "norm": "Linf",
        "eps": 8 / 255,
        "version": "standard",
        "verbose": False,
    },
    "mim_linf": {
        "model": None,
        "eps": 8 / 255,
        "num_steps": 20,
        "step_size": 0.002,
        "decay_factor": 1.0,
    },
    "pgd_l1": {
        "model": None,
        "eps": 1600.0,
        "input_size": 224,
        "eps_step": 120,
        "max_iter": 20,
        "batch_size": 16,
    },
}


def _add_noise_for_imagenet_c(image, severity=1, corruption_name=None,
                              corruption_number=-1, seed=None):
    """Reference behavior (add_noise_utils.py:22-31) with a batched fast path."""
    if isinstance(image, str):
        return corrupt(
            image_from_path(image), severity=severity,
            corruption_name=corruption_name,
            corruption_number=corruption_number, seed=seed,
        )
    arr = np.asarray(image)
    if arr.ndim == 3:
        return corrupt(arr, severity=severity, corruption_name=corruption_name,
                       corruption_number=corruption_number, seed=seed)
    # batched (n, h, w, 3): one on-device vmapped call
    from robustart_tpu.noise.corruptions import CORRUPTION_ORDER

    name = corruption_name or CORRUPTION_ORDER[corruption_number]
    x01 = arr.astype(np.float32) / 255.0
    key = jax.random.key(int(seed) if seed is not None else
                         int(np.random.default_rng().integers(2**31)))
    out = corrupt_batch(x01, key, name, severity)
    return np.asarray(np.floor(np.asarray(out) * 255.0), dtype=np.uint8)


def image_from_path(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def _make_adv_fn(attack_name: str, model_key: str):
    def fn(image, label, seed=None, **config):
        model = config.pop(model_key)
        if model is None:
            raise ValueError(
                f"set_config({model_key}=<Classifier>) before add_noise for "
                f"'{attack_name}'"
            )
        x = np.asarray(image, dtype=np.float32)
        key = jax.random.key(int(seed) if seed is not None else
                             int(np.random.default_rng().integers(2**31)))
        labels = np.asarray(label)
        attack = ATTACKS[attack_name]
        out = attack(
            lambda v, img: model.apply_fn(v, img, train=False),
            model.variables, x, labels, key, **config,
        )
        return np.asarray(out)

    return fn


def _autoattack_linf(image, label, model=None, norm="Linf", eps=8 / 255,
                     version="standard", verbose=False, seed=None):
    from robustart_tpu.attacks.autoattack import AutoAttack

    if model is None:
        raise ValueError("set_config(model=<Classifier>) before add_noise")
    aa = AutoAttack(model, norm=norm, eps=eps, version=version, verbose=verbose,
                    seed=seed)
    x = np.asarray(image, dtype=np.float32)
    return np.asarray(
        aa.run_standard_evaluation(x, np.asarray(label), bs=x.shape[0])
    )


function_dict = {
    "imagenet-s": add_noise_for_imagenet_s,
    "imagenet-c": _add_noise_for_imagenet_c,
    "pgd_l1": _make_adv_fn("pgd_l1", "model"),
    "pgd_linf": _make_adv_fn("pgd_linf", "f_model"),
    "pgd_l2": _make_adv_fn("pgd_l2", "f_model"),
    "fgsm": _make_adv_fn("fgsm", "f_model"),
    "autoattack_linf": _autoattack_linf,
    "mim_linf": _make_adv_fn("mim_linf", "model"),
}

# kwargs accepted by the underlying attack fns differ slightly from the
# reference config names; map reference keys to our attack kwargs
_KWARG_FIXUPS = {
    "pgd_l1": {"batch_size": None},  # batching is implicit on TPU
}


class AddNoise:
    """Add noise to one image or a batch — reference facade semantics
    (reference add_noise.py:5-42)."""

    def __init__(self, noise_type: str):
        self.noise_type = noise_type
        assert noise_type in noise_list, f"Add noise only support for {noise_list}"
        self.config = dict(default_config[noise_type])

    def set_config(self, **kwargs: Any) -> None:
        unexpected = set(kwargs) - set(self.config)
        assert not unexpected, f"Key Error! Unexpect Keys {unexpected}"
        self.config.update(kwargs)

    def add_noise(self, image, label=None, seed: int | None = None):
        """Apply the configured noise.

        :param image: file path (imagenet-s / imagenet-c only), a single
            (h, w, 3) array, or a batch (n, h, w, 3).
        :param label: integer labels, required for adversarial noise.
        :param seed: optional reproducibility seed (extension).
        :return: noised array with the same layout as the input.
        """
        if isinstance(image, str):
            assert self.noise_type in ("imagenet-s", "imagenet-c"), (
                "Only imagenet-s and imagenet-c support image path input"
            )
        if self.noise_type in ("imagenet-s", "imagenet-c"):
            if self.noise_type == "imagenet-s":
                return function_dict[self.noise_type](image, **self.config)
            return function_dict[self.noise_type](image, seed=seed, **self.config)
        return function_dict[self.noise_type](image, label, seed=seed, **self.config)
