#!/bin/bash
# src x tgt x eps FGSM transfer matrix; idempotent by results.txt.all
# (reference batch_eval_transfer/batch_eval_adv_transfer_auto_arch.sh)
model_names=('resnet50_official' 'vit_b16_224' 'mixer_b16_224')
CKPT_DIR=${ROBUSTART_CKPT:-"${ROBUSTART_DATA:-/data/robustart}/ckpt"}
eps_list=('8/255' '2/255' '0.5/255')
dir_name=('fgsm_0.031' 'fgsm_0.007' 'fgsm_0.001')
for ((i=0;i<${#eps_list[@]};i++)); do
  for src in "${model_names[@]}"; do
    for tgt in "${model_names[@]}"; do
      out="${src}_To_${tgt}/${dir_name[$i]}"
      if [ -f "$out/results.txt.all" ]; then continue; fi
      python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $src --src_path "$CKPT_DIR/$src.pth.tar" --tgt_name $tgt --tgt_path "$CKPT_DIR/$tgt.pth.tar" --attack fgsm --eps ${eps_list[$i]}
    done
  done
done
