#!/bin/bash
# End-to-end benchmark battery on the fake backend — exercises every solver
# without any dataset on disk. Real runs: point the exprs/ configs at
# $ROBUSTART_DATA instead.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/robustart_demo}
rm -rf "$OUT"; mkdir -p "$OUT"

python - "$OUT" <<'PY'
import sys

from robustart_tpu.core.config import Config
from robustart_tpu.solvers import (
    BenchmarkEvalAdvSolver, ImgnetAOEvalSolver, ImgnetPEvalSolver,
    MultiEvalDecoderResizeSolver, MultiEvalSolver,
)

out = sys.argv[1]


def cfg(sub, **test):
    base_test = {"sampler": {"type": "distributed"},
                 "transforms": {"type": "JUSTNORM"},
                 "evaluator": {"type": "imagenetc", "kwargs": {"topk": [1, 5]}}}
    base_test.update(test)
    return Config({
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "seed": 0,
        "data": {"read_from": "fake", "fake_size": 32, "fake_num_classes": 10,
                 "batch_size": 16, "num_workers": 2, "input_size": 32,
                 "test": base_test},
        "saver": {"results_dir": f"{out}/resnet18/{sub}"},
    })


print("== ImageNet-C (online, on-device corruption) ==")
MultiEvalSolver(cfg("imagenet-c", imagenet_c_online=True,
                    corruptions=["gaussian_noise", "contrast"],
                    severities=[1, 3])).evaluate()
print("== ImageNet-A/O ==")
ImgnetAOEvalSolver(cfg("imagenet-a_o", **{"imagenet_a&o": True})).evaluate()
print("== ImageNet-P (online sequences) ==")
ImgnetPEvalSolver(cfg("imagenet-p", imagenet_p_online=True,
                      perturbations=["gaussian_noise", "rotate"],
                      n_frames=4)).evaluate()
print("== ImageNet-S (decoder x resize) ==")
s_cfg = cfg("imagenet-s", decoders=["pil", "opencv"],
            resize_types=["pil-bilinear", "opencv-bilinear"],
            limit_samples=8, fake_root=f"{out}/s_fake")
s_cfg.data.fake_size = 8
MultiEvalDecoderResizeSolver(s_cfg).evaluate()
print("== adversarial benchmark (FGSM) ==")
a_cfg = cfg("adv_unused")
a_cfg.saver.results_dir = f"{out}/resnet18/adv/resnet18_to_resnet18"
BenchmarkEvalAdvSolver(a_cfg, attack="fgsm", eps=8.0).evaluate()
PY

echo "== leaderboard =="
python -m robustart_tpu.tools.leaderboard --results_root "$OUT" \
    --output "$OUT/leaderboard.json"
echo "done: $OUT"
