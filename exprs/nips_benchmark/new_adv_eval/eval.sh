#!/bin/bash
# idempotent: a finished dir has results.txt.all
# newer-model eval set (reference new_adv_eval/eval.sh:18-27)
model_names=('convnext_base' 'convnextv2_base' 'convnext_base_cvst' 'vit_base' 'vit_base_cvst' 'clip_vit_l_14' 'clip_vit_l_14_fare2_clip' 'clip_vit_l_14_tecoa2_clip')
CKPT_DIR=${ROBUSTART_CKPT:-"${ROBUSTART_DATA:-/data/robustart}/ckpt"}
for name in "${model_names[@]}"; do
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack fgsm --eps 0.5/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack fgsm --eps 2/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack fgsm --eps 8/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_linf --eps 0.5/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_linf --eps 2/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_linf --eps 8/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack autoattack_linf --eps 0.5/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack autoattack_linf --eps 2/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack autoattack_linf --eps 8/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack mim_linf --eps 0.5/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack mim_linf --eps 2/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack mim_linf --eps 8/255
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l2 --eps 0.5
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l2 --eps 2.0
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l2 --eps 8.0
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l1 --eps 100.0
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l1 --eps 400.0
  python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $name --src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $name --tgt_path "$CKPT_DIR/$name.pth.tar" --attack pgd_l1 --eps 1600.0
done
