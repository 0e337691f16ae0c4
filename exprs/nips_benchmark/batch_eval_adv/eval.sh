#!/bin/bash
# full attack x eps grid (reference batch_eval_adv/eval.sh:9-13)
SRC=${1:?src model name}; SRC_PATH=${2:?src ckpt}
TGT=${3:-$SRC}; TGT_PATH=${4:-$SRC_PATH}
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack fgsm --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack fgsm --eps 2
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack fgsm --eps 8
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_linf --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_linf --eps 2
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_linf --eps 8
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack autoattack_linf --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack autoattack_linf --eps 2
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack autoattack_linf --eps 8
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack mim_linf --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack mim_linf --eps 2
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack mim_linf --eps 8
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l2 --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l2 --eps 2
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l2 --eps 8
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l1 --eps 100
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l1 --eps 400
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $SRC --src_path $SRC_PATH --tgt_name $TGT --tgt_path $TGT_PATH --attack pgd_l1 --eps 1600
