"""The generated exprs smoke config drives cls_solver end to end via the CLI
(reference Test config pattern, exprs/robust_baseline_exp/Test/)."""

import os

import yaml


def test_smoke_config_runs_via_cli(tmp_path):
    cfg_path = "exprs/robust_baseline_exp/Test/resnet18/config.yaml"
    assert os.path.exists(cfg_path)
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    # shrink for CI and redirect outputs
    cfg["model"] = {"type": "resnet18", "kwargs": {"num_classes": 10}}
    cfg["data"]["fake_size"] = 16
    cfg["data"]["fake_num_classes"] = 10
    cfg["data"]["batch_size"] = 8
    cfg["data"]["input_size"] = 32
    cfg["saver"]["save_dir"] = str(tmp_path / "ck")
    cfg["saver"]["results_path"] = str(tmp_path / "r" / "results.txt.all")
    cfg["saver"]["val_freq"] = 1000
    test_cfg = str(tmp_path / "config.yaml")
    with open(test_cfg, "w") as f:
        yaml.safe_dump(cfg, f)

    from robustart_tpu.solvers.cls_solver import main

    metrics = main(["--config", test_cfg, "--evaluate"])
    assert "top1" in metrics
