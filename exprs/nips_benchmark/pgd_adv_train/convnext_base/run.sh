#!/bin/bash
python -u -m robustart_tpu.solvers.adv_cls_solver_train_pgd --config config.yaml "$@"
