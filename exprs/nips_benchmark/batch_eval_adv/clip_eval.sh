#!/bin/bash
# CLIP tower adversarial eval (reference batch_eval_adv/clip_eval.sh)
CKPT=${1:?clip ckpt path}
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack fgsm --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack fgsm --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack fgsm --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack autoattack_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack autoattack_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack autoattack_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack mim_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack mim_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack mim_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l2 --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l2 --eps 2.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l2 --eps 8.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l1 --eps 100.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l1 --eps 400.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config clip_config.yaml --src_name clip_vit_l_14 --src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT --attack pgd_l1 --eps 1600.0
