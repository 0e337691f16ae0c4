"""multi_eval_solver precomputed mode: all.json → stored corruption slices."""

import json

import numpy as np
from PIL import Image

from robustart_tpu.core.config import Config
from robustart_tpu.solvers import MultiEvalSolver


def test_precomputed_imagenet_c(tmp_path):
    # build tiny stored "ImageNet-C" slices: 2 corruptions x 2 severities
    rng = np.random.default_rng(0)
    all_meta = {}
    for corr in ("gaussian_noise", "fog"):
        all_meta[corr] = {}
        for sev in ("1", "2"):
            d = tmp_path / "data" / corr / sev
            d.mkdir(parents=True)
            meta = d / "meta.txt"
            with meta.open("w") as f:
                for i in range(6):
                    arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
                    Image.fromarray(arr).save(d / f"{i}.png")
                    f.write(f"{i}.png {i % 10}\n")
            all_meta[corr][sev] = {
                "root_dir": str(d), "meta_file": str(meta),
            }
    all_json = tmp_path / "all.json"
    all_json.write_text(json.dumps(all_meta))

    cfg = Config(
        {
            "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
            "seed": 0,
            "data": {
                "read_from": "fs",
                "batch_size": 4,
                "num_workers": 2,
                "input_size": 32,
                "test_resize": 36,
                "test": {
                    "meta_file": str(all_json),
                    "sampler": {"type": "distributed"},
                    "transforms": {"type": "ONECROP"},
                    "corruptions": ["gaussian_noise", "fog"],
                    "severities": [1, 2],
                    "evaluator": {"type": "imagenetc", "kwargs": {"topk": [1, 5]}},
                },
            },
            "saver": {"results_dir": str(tmp_path / "results")},
        }
    )
    summary = MultiEvalSolver(cfg).evaluate()
    assert set(summary["top1_per_corruption"]) == {"gaussian_noise", "fog"}
    res = tmp_path / "results" / "fog" / "2" / "results.txt.all"
    assert res.exists()
    assert len(open(res).readlines()) == 6
