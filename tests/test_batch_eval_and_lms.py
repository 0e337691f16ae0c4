"""eval_list batch evaluation + LMS→remat mapping tests."""

import json

import yaml

from robustart_tpu.core.config import Config
from robustart_tpu.solvers.cls_solver import ClsSolver, main as cls_main


def _base(tmp_path, **extra):
    cfg = {
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10}},
        "seed": 0,
        "optimizer": {"type": "SGD", "kwargs": {"momentum": 0.9}},
        "lr_scheduler": {
            "type": "CosineEpoch",
            "kwargs": {"base_lr": 0.01, "warmup_lr": 0.01, "warmup_epoch": 0,
                       "max_epoch": 1, "min_lr": 0.0},
        },
        "data": {
            "read_from": "fake", "fake_size": 16, "fake_num_classes": 10,
            "batch_size": 8, "num_workers": 2, "input_size": 32,
            "train": {"sampler": {"type": "distributed_iteration"},
                      "transforms": {"type": "JUSTNORM"}},
            "test": {"sampler": {"type": "distributed"},
                     "transforms": {"type": "JUSTNORM"},
                     "evaluator": {"type": "imagenet", "kwargs": {"topk": [1, 5]}}},
        },
        "saver": {"print_freq": 100, "val_freq": 1000,
                  "save_dir": str(tmp_path / "ck"),
                  "results_path": str(tmp_path / "r" / "results.txt.all")},
    }
    cfg.update(extra)
    return cfg


def test_eval_list_batch_eval(tmp_path):
    cfg = _base(tmp_path)
    cfg["eval_list"] = [
        {"saver": {"results_path": str(tmp_path / "e0" / "results.txt.all")}},
        {"model": {"kwargs": {"num_classes": 10}},
         "saver": {"results_path": str(tmp_path / "e1" / "results.txt.all")}},
    ]
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    results = cls_main(["--config", str(cfg_path), "--evaluate"])
    assert len(results) == 2
    assert all("top1" in r for r in results)
    assert (tmp_path / "e0" / "results.txt.all").exists()
    assert (tmp_path / "e1" / "results.txt.all").exists()


def test_lms_remat_training_runs(tmp_path):
    cfg = Config(_base(tmp_path, lms={"enable": True, "kwargs": {"limit": 12}}))
    solver = ClsSolver(cfg)
    solver.train()
    metrics = solver.evaluate()
    assert "top1" in metrics


def test_result_writer_multirank_merge(tmp_path):
    from robustart_tpu.solvers.base import ResultWriter

    path = str(tmp_path / "results.txt.all")
    # simulate two ranks writing shards, rank 0 merging
    w1 = ResultWriter(path, rank=1, world_size=2)
    w1.write({"prediction": 1, "label": 1})
    w1.close()
    w0 = ResultWriter(path, rank=0, world_size=2)
    w0.write({"prediction": 0, "label": 0})
    w0.close()
    merged = w0.merge()
    lines = open(merged).read().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["label"] == 0  # rank order preserved
    assert json.loads(lines[1])["label"] == 1
