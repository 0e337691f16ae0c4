#!/bin/bash
# data-parallel training on all local TPU devices (replaces the reference's
# `spring.submit run -n16 --gpu` NCCL launcher, resnet50/run.sh:1-2)
python -u -m robustart_tpu.solvers.cls_solver --config config.yaml "$@"
# resume: add --recover=checkpoints/ckpt.msgpack
