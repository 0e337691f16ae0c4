#!/bin/bash
python -u -m robustart_tpu.solvers.imgnet_p_eval_solver --config config_vit_base.yaml --evaluate "$@"
