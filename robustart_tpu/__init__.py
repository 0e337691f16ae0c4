"""robustart_tpu — a TPU-native robustness benchmarking framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the full capability
surface of DIG-Beihang/RobustART (reference layer map: SURVEY.md §1):

- ``robustart_tpu.noise``   — AddNoise facade: ImageNet-C corruptions (batched,
  on-device), ImageNet-S system noise, adversarial noise (cf. reference
  RobustART/noise/add_noise.py:5).
- ``robustart_tpu.attacks`` — FGSM/PGD-{Linf,L2,L1}/MIM/AutoAttack as jitted
  ``jax.grad`` loops (cf. reference RobustART/noise/utils/adv/attack.py:20-52).
- ``robustart_tpu.models``  — Flax model zoo with ``get_model(name, **kwargs)``
  (cf. reference prototype model zoo, SURVEY.md §2.9).
- ``robustart_tpu.metrics`` — evaluators for ImageNet-{A,O,P,C,S}, AR, WCAR,
  calibration (cf. reference RobustART/metrics/).
- ``robustart_tpu.data``    — meta-file datasets, readers {fs,fake}, samplers,
  transform presets (cf. reference prototype.data, SURVEY.md §2.9).
- ``robustart_tpu.solvers`` — train/eval pipelines with the reference CLI
  surface (cf. reference prototype.solver.*, SURVEY.md §2.9).
- ``robustart_tpu.parallel``— device-mesh / sharding utilities (DP via pjit,
  SyncBN via pmean; replaces NCCL/torchrun, SURVEY.md §2.11).
"""

__version__ = "0.1.0"
