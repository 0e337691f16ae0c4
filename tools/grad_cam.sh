#!/bin/bash
# Grad-CAM / attention-rollout driver (reference grad_cam.sh:1-16).
# The reference fakes single-rank SLURM env vars; this build's tools run
# single-process natively, so only the CLI remains.
#
# usage: tools/grad_cam.sh <config.yaml> <imgdir> <outdir> [--attn_rollout]
set -e
CONFIG=${1:?config.yaml}
INPUT=${2:?input image dir}
OUTPUT=${3:?output dir}
shift 3
python -u -m robustart_tpu.tools.inference \
    --config "$CONFIG" -i "$INPUT" -o "$OUTPUT" "$@"
