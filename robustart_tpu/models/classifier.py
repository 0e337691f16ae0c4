"""Classifier bundle: module + variables + preprocessing, with pure fns.

The reference couples "model" and "ImageNet normalization" at every attack
boundary (NormalizeModel wrap, reference
RobustART/noise/utils/adv/Attacks/autoattack/autoattack.py:12-23; hard-coded
mean/std in attack.py:47 and imfgsm_attack.py:14-23). We make that contract
explicit: a :class:`Classifier` consumes NHWC images in **[0,1]** and applies
its own normalization inside the jitted forward, so every attack/solver
composes with every model without re-plumbing constants.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import IMAGENET_MEAN, IMAGENET_STD, normalize_01


def _fused_eval_fn(module):
    """Mirror-forward dispatch for deterministic TPU evals.

    Some architectures run fastest as variable-tree mirror forwards built
    around whole-stage Pallas programs (same pattern as the int8
    quantizers' calibration graphs). Returns ``fn(module, variables, x)``
    or None to use ``module.apply``.
    """
    from robustart_tpu.models.densenet import DenseNet

    if isinstance(module, DenseNet) and module.block_impl == "slab":
        # Concat-free slab forward — kept as the design record of the
        # round-5 structural study, NOT the default: on chip the per-slab
        # dots' partial-sum outputs cost more than the concat writes they
        # save (block-2 probe, scripts/probe_densenet_block.py: concat
        # 9.63 ms, bundle 12.11, slab 17.93, fori_pad 21.46; end-to-end
        # slab 5,564 img/s vs 6,329 buffer). Opt in via block_impl='slab'.
        # Parity: tests/test_models.py::test_densenet_slab_parity.
        from robustart_tpu.models.densenet import slab_eval_forward

        return slab_eval_forward
    if (
        isinstance(module, DenseNet)
        and module.block_impl == "pallas"
        and jax.default_backend() == "tpu"
    ):
        # BURIED (round 4): two separate chip attempts (r3 + r4) wedged the
        # TPU worker process on this kernel's first dispatch — recovery
        # takes ~30 min each time and kills every job on the chip. The
        # kernel stays interpret-mode-correct (tests/test_pallas_densenet)
        # but must never run on shared hardware. See WORKLOG "DenseNet
        # whole-block kernel: buried".
        import warnings

        warnings.warn(
            "DenseNet block_impl='pallas' has wedged the TPU worker on both "
            "chip attempts (WORKLOG round 4); running it on real TPU "
            "hardware risks a ~30 min worker outage. Set "
            "ROBUSTART_DENSENET_PALLAS_UNSAFE=1 to proceed anyway.",
            RuntimeWarning,
            stacklevel=2,
        )
        if os.environ.get("ROBUSTART_DENSENET_PALLAS_UNSAFE") != "1":
            return None
        from robustart_tpu.models.densenet import fused_eval_forward

        return fused_eval_forward
    return None


@dataclasses.dataclass
class Classifier:
    """A model + its state, operating on [0,1] NHWC images."""

    name: str
    module: nn.Module
    variables: Any  # {'params': ..., 'batch_stats': ...}
    mean: Sequence[float] = IMAGENET_MEAN
    std: Sequence[float] = IMAGENET_STD
    input_size: int = 224
    num_classes: int = 1000

    def apply_fn(
        self,
        variables: Any,
        images01: jax.Array,
        train: bool = False,
        rngs: dict | None = None,
    ):
        """Pure forward: normalize + model apply. Safe to jit / grad through.

        In train mode returns ``(logits, new_variables)`` (BN stats update);
        in eval mode returns logits only.
        """
        x = normalize_01(images01, self.mean, self.std)
        if train:
            logits, updates = self.module.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return logits, updates
        fused = _fused_eval_fn(self.module)
        if fused is not None:
            return fused(self.module, variables, x)
        return self.module.apply(variables, x, train=False)

    def logits_fn(self) -> Callable[[Any, jax.Array], jax.Array]:
        """Eval-mode pure fn ``(variables, images01) -> logits`` for attacks."""

        def fn(variables, images01):
            return self.apply_fn(variables, images01, train=False)

        return fn

    def __call__(self, images01: jax.Array) -> jax.Array:
        return self.apply_fn(self.variables, images01, train=False)

    def predict(self, images01: jax.Array) -> jax.Array:
        return jnp.argmax(self(images01), axis=-1)


def init_classifier(
    name: str,
    module: nn.Module,
    rng: jax.Array | int = 0,
    input_size: int = 224,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    num_classes: int | None = None,
    batch_size: int = 1,
) -> Classifier:
    if isinstance(rng, int):
        rng = jax.random.key(rng)
    dummy = jnp.zeros((batch_size, input_size, input_size, 3), jnp.float32)
    variables = module.init({"params": rng}, dummy, train=False)
    if num_classes is None:
        num_classes = getattr(module, "num_classes", 1000)
    return Classifier(
        name=name,
        module=module,
        variables=variables,
        mean=mean,
        std=std,
        input_size=input_size,
        num_classes=num_classes,
    )
