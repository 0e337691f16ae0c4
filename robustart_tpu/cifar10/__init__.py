"""CIFAR-10 standalone suite (reference cifar10/code/; SURVEY.md §2.6).

The NeurIPS'22 "architecture ↔ adversarially robust generalization" vertical
slice: CIFAR-scale models, AutoAugment/RandAugment, a training CLI with
optional PGD adversarial training, and the four robustness test CLIs
(multi-attack adversarial, CIFAR-10-C mCE, CIFAR-10-P flip/Zipf,
CIFAR-10-S system noise).
"""

from robustart_tpu.cifar10.models import CIFAR_MODELS, get_cifar_model

__all__ = ["CIFAR_MODELS", "get_cifar_model"]
