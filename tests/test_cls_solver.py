"""End-to-end cls_solver tests on the fake backend (SURVEY.md §4 strategy).

Exercises: config → model → sharded train loop (8-device CPU mesh) →
checkpoint → eval loop → results.txt.all → evaluator — the minimum
end-to-end slice of SURVEY.md §7.
"""

import json
import os

import numpy as np
import pytest

from robustart_tpu.core.config import Config
from robustart_tpu.solvers.cls_solver import ClsSolver


def _cfg(tmp_path, train=True, num_classes=10):
    return Config(
        {
            "model": {
                "type": "resnet18",
                "kwargs": {"num_classes": num_classes},
            },
            "seed": 0,
            "label_smooth": 0.1,
            "mixup": 0.2,
            "cutmix": 1.0,
            "ema": {"enable": True, "kwargs": {"decay": 0.99}},
            "optimizer": {
                "type": "SGD",
                "kwargs": {"momentum": 0.9, "nesterov": True,
                           "weight_decay": 0.0001},
            },
            "lr_scheduler": {
                "type": "CosineEpoch",
                "kwargs": {
                    "base_lr": 0.01, "warmup_lr": 0.04, "warmup_epoch": 1,
                    "max_epoch": 2, "min_lr": 0.0,
                },
            },
            "data": {
                "type": "imagenet",
                "read_from": "fake",
                "fake_size": 32,
                "fake_num_classes": num_classes,
                "batch_size": 8,
                "num_workers": 2,
                "input_size": 32,
                "test_resize": 36,
                "train": {
                    "sampler": {"type": "distributed_iteration"},
                    "transforms": {"type": "JUSTNORM"},
                },
                "test": {
                    "sampler": {"type": "distributed"},
                    "transforms": {"type": "JUSTNORM"},
                    "evaluator": {"type": "imagenet", "kwargs": {"topk": [1, 5]}},
                },
            },
            "saver": {
                "print_freq": 2,
                "val_freq": 100,
                "save_many": False,
                "save_dir": str(tmp_path / "checkpoints"),
                "results_path": str(tmp_path / "results" / "results.txt.all"),
            },
        }
    )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cls")
    solver = ClsSolver(_cfg(tmp_path))
    solver.train()
    return solver, tmp_path


def test_train_runs_and_checkpoints(trained):
    solver, tmp_path = trained
    assert os.path.exists(tmp_path / "checkpoints" / "ckpt.msgpack")
    assert int(solver._train_state.step) == 8  # 2 epochs x 4 steps


def test_eval_writes_results_and_metric(trained):
    solver, tmp_path = trained
    metrics = solver.evaluate()
    res_file = tmp_path / "results" / "results.txt.all"
    assert res_file.exists()
    lines = [json.loads(l) for l in open(res_file)]
    assert len(lines) == 32  # every fake sample exactly once
    assert len(lines[0]["score"]) == 10
    assert set(metrics) == {"top1", "top5"}
    # 10-class fake data, 2 epochs: should beat random chance on top5
    assert metrics["top5"] >= 30.0


def test_eval_from_checkpoint_path(trained, tmp_path):
    solver, train_tmp = trained
    cfg = _cfg(train_tmp)
    cfg.saver.results_path = str(tmp_path / "r2" / "results.txt.all")
    s2 = ClsSolver(cfg)
    metrics = s2.evaluate(ckpt_path=str(train_tmp / "checkpoints"))
    assert set(metrics) == {"top1", "top5"}


def test_training_reduces_loss(tmp_path):
    # memorization sanity without batch augmentation (mixup/cutmix blur labels)
    cfg = _cfg(tmp_path, num_classes=10)
    cfg.mixup = 0.0
    cfg.cutmix = 0.0
    cfg.label_smooth = 0.0
    cfg.lr_scheduler.kwargs.max_epoch = 4
    solver = ClsSolver(cfg)
    solver.train()
    # few steps -> BN running stats lag; measure memorization with batch stats
    # (train-mode forward, params frozen), which isolates "did SGD learn"
    from robustart_tpu.data import build_dataloader

    loader = build_dataloader(cfg.data, "test")
    clf = solver.classifier
    correct = total = 0
    for batch in loader:
        x = batch.image.astype(np.float32) / 255.0
        logits, _ = clf.apply_fn(clf.variables, x, train=True)
        pred = np.asarray(logits).argmax(-1)
        correct += int((pred[batch.mask] == batch.label[batch.mask]).sum())
        total += int(batch.mask.sum())
    assert correct / total > 0.3  # memorization beats 10% chance


def test_train_history_jsonl(trained):
    """Train solvers emit a step-scalar JSONL (reference logged curves via
    tensorboardx, reference requirements.txt:11)."""
    solver, tmp_path = trained
    hist = tmp_path / "checkpoints" / "train_history.jsonl"
    assert hist.exists()
    recs = [json.loads(l) for l in open(hist)]
    assert len(recs) == 4  # 8 steps / print_freq 2
    assert set(recs[0]) == {"step", "epoch", "loss", "acc", "lr", "time"}
    assert recs[-1]["step"] == 8


def test_ema_weights_used_for_eval(tmp_path):
    """EMA-trained checkpoints evaluate the EMA copy by default and under
    ``model.use_ema: true``; ``model.use_ema: false`` keeps the raw weights
    (reference ema axis, exprs/nips_benchmark/ema/resnet50/config.yaml:30-32)."""
    from robustart_tpu.solvers.base import (
        _tree_flatten_with_names,
        load_checkpoint,
    )

    cfg = _cfg(tmp_path)
    cfg.lr_scheduler.kwargs.max_epoch = 1
    cfg.ema = {"enable": True, "kwargs": {"decay": 0.5}}
    solver = ClsSolver(cfg)
    solver.train()

    ckpt = load_checkpoint(str(tmp_path / "checkpoints" / "ckpt.msgpack"))
    raw = _tree_flatten_with_names(ckpt["variables"]["params"])
    ema = _tree_flatten_with_names(ckpt["extra"]["state"]["ema_params"])
    key = next(k for k in raw if "kernel" in k)
    assert not np.allclose(raw[key], ema[key])  # training moved the weights

    # post-train evaluate() swaps in the EMA copy
    solver.evaluate()
    got = _tree_flatten_with_names(solver.classifier.variables["params"])
    np.testing.assert_allclose(np.asarray(got[key]), ema[key])

    # fresh solver evaluating from the checkpoint defaults to EMA too
    cfg2 = _cfg(tmp_path)
    cfg2.saver.results_path = str(tmp_path / "r_ema" / "results.txt.all")
    s2 = ClsSolver(cfg2)
    s2.evaluate(ckpt_path=str(tmp_path / "checkpoints"))
    got2 = _tree_flatten_with_names(s2.classifier.variables["params"])
    np.testing.assert_allclose(np.asarray(got2[key]), ema[key])

    # explicit opt-out keeps raw weights
    cfg3 = _cfg(tmp_path)
    cfg3.model.use_ema = False
    cfg3.saver.results_path = str(tmp_path / "r_raw" / "results.txt.all")
    s3 = ClsSolver(cfg3)
    s3.evaluate(ckpt_path=str(tmp_path / "checkpoints"))
    got3 = _tree_flatten_with_names(s3.classifier.variables["params"])
    np.testing.assert_allclose(np.asarray(got3[key]), raw[key])


def test_max_iter_stops_mid_epoch(tmp_path):
    """Iteration-budgeted recipes stop at exactly max_iter steps (reference
    exp/models Step-scheduler configs use max_iter with no max_epoch)."""
    cfg = _cfg(tmp_path)
    cfg.ema = {"enable": False}
    cfg.lr_scheduler = Config({
        "type": "Step",
        "kwargs": {"base_lr": 0.01, "lr_steps": [2], "lr_mults": [0.1],
                   "max_iter": 3},
    })
    solver = ClsSolver(cfg)
    solver.train()
    assert int(solver._train_state.step) == 3  # not 4 (steps_per_epoch)


def test_model_dtype_config_bf16(tmp_path):
    """``model.dtype: bf16`` builds the eval model in bfloat16 and the CLI
    eval still produces a valid metric + result file."""
    import jax.numpy as jnp
    import yaml

    cfg = {
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10},
                  "dtype": "bf16"},
        "data": {"type": "imagenet", "read_from": "fake", "fake_size": 8,
                 "fake_num_classes": 10, "batch_size": 8, "input_size": 32,
                 "num_workers": 0,
                 "test": {"evaluator": {"type": "imagenet",
                                        "kwargs": {"topk": [1, 5]}}}},
        "saver": {"save_dir": str(tmp_path / "ck"),
                  "results_path": str(tmp_path / "results.txt.all")},
        "lr_scheduler": {"type": "CosineEpoch", "kwargs": {"max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from robustart_tpu.solvers.cls_solver import ClsSolver
    from robustart_tpu.core.config import load_config

    solver = ClsSolver(load_config(cfg_path))
    metrics = solver.evaluate()
    assert "top1" in metrics
    assert solver.classifier.module.dtype == jnp.bfloat16


def test_foreign_torch_checkpoint_eval_and_recover(tmp_path):
    """``--ckpt-filePath``/``--recover`` accept foreign torch checkpoints with
    the reference's own layout tolerance — {state_dict|model|net|raw} keys +
    ``module.`` prefixes (reference cifar10/code/test_cifar_c.py:169-187)."""
    import torch

    from tests.test_torch_convert import TorchResNet18

    torch.manual_seed(0)
    net = TorchResNet18(num_classes=10).eval()
    sd = {"module." + k: v for k, v in net.state_dict().items()}
    ckpt = tmp_path / "foreign.pth.tar"
    torch.save({"model": sd}, ckpt)

    # evaluate straight off the torch checkpoint
    cfg = _cfg(tmp_path)
    solver = ClsSolver(cfg, evaluate_only=True)
    metrics = solver.evaluate(ckpt_path=str(ckpt))
    assert set(metrics) == {"top1", "top5"}
    got = solver.classifier.variables["params"]["fc"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), net.state_dict()["fc.weight"].numpy().T, atol=1e-6
    )

    # --recover warm-starts training from the torch weights
    cfg2 = _cfg(tmp_path)
    cfg2.lr_scheduler.kwargs.max_epoch = 1
    cfg2.saver.save_dir = str(tmp_path / "ck2")
    s2 = ClsSolver(cfg2)
    s2.train(recover=str(ckpt))
    assert int(s2._train_state.step) == 4  # fresh epoch count, trained
