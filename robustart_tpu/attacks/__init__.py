"""Adversarial attacks (jitted JAX grad loops; TPU-native).

Replaces the reference's foolbox/ART/vendored-AutoAttack stack
(reference RobustART/noise/utils/adv/; SURVEY.md §2.2).
"""

from robustart_tpu.attacks.gradient import (
    ATTACKS,
    fgsm,
    make_attack_fn,
    mim_linf,
    pgd_l1,
    pgd_l2,
    pgd_linf,
)

__all__ = [
    "ATTACKS",
    "fgsm",
    "pgd_linf",
    "pgd_l2",
    "pgd_l1",
    "mim_linf",
    "make_attack_fn",
]
