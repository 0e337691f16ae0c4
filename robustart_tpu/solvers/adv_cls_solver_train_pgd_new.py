"""Alias of adv_cls_solver_train_pgd — the reference's ``_new`` variant is the
same solver launched with the AdamW + no_wd config (reference
new_adv_train/vit_base/run.sh:11, config.yaml:11-15); the recipe lives in the
YAML, not the code."""

from robustart_tpu.solvers.adv_cls_solver_train_pgd import (
    AdvClsSolverTrainPGD,
    main,
)

if __name__ == "__main__":
    main()
