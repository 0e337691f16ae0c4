#!/bin/bash
python -u -m robustart_tpu.solvers.cls_solver --config config.yaml "$@"
