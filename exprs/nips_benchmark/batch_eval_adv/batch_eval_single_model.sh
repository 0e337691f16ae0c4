#!/bin/bash
# full grid for ONE model (reference batch_eval_adv/batch_eval_single_model.sh)
NAME=${1:?model name}; CKPT=${2:?ckpt path}
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack fgsm --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack fgsm --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack fgsm --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack autoattack_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack autoattack_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack autoattack_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack mim_linf --eps 0.5/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack mim_linf --eps 2/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack mim_linf --eps 8/255
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l2 --eps 0.5
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l2 --eps 2.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l2 --eps 8.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l1 --eps 100.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l1 --eps 400.0
python -u -m robustart_tpu.solvers.benchmark_eval_adv --config config.yaml --src_name $NAME --src_path $CKPT --tgt_name $NAME --tgt_path $CKPT --attack pgd_l1 --eps 1600.0
