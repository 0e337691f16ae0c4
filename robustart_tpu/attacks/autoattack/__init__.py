"""AutoAttack ensemble (APGD-CE/T, FAB-T, Square) — TPU-native.

Replaces the reference's vendored fra31/auto-attack
(reference RobustART/noise/utils/adv/Attacks/autoattack/; SURVEY.md §2.2).
"""

from robustart_tpu.attacks.autoattack.apgd import (
    apgd_attack,
    dlr_loss,
    dlr_loss_targeted,
)
from robustart_tpu.attacks.autoattack.core import AutoAttack
from robustart_tpu.attacks.autoattack.fab import fab_attack_targeted
from robustart_tpu.attacks.autoattack.square import (
    square_attack_l1,
    square_attack_l2,
    square_attack_linf,
)

__all__ = [
    "AutoAttack",
    "apgd_attack",
    "fab_attack_targeted",
    "square_attack_linf",
    "square_attack_l2",
    "square_attack_l1",
    "dlr_loss",
    "dlr_loss_targeted",
]
