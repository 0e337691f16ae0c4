#!/bin/bash
python -u -m robustart_tpu.solvers.multi_eval_solver --config config_vit_base.yaml --evaluate "$@"
