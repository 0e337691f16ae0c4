"""Alias of benchmark_eval_adv (reference ``base_benchmark_eval_adv`` —
reference nips_benchmark/adv_eval/eval.sh:47)."""

from robustart_tpu.solvers.benchmark_eval_adv import BenchmarkEvalAdvSolver, main

if __name__ == "__main__":
    main()
