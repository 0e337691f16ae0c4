#!/bin/bash
python -u -m robustart_tpu.solvers.imgnet_a_o_eval_solver --config config_vit_base.yaml --evaluate "$@"
