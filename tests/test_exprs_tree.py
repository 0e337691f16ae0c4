"""The full generated exprs/ tree: file-parity vs the reference layout,
YAML validity, and model-type resolvability (reference exprs/ tree;
VERDICT r1 item 4 — the experiment grid, not just the tools).
"""

import os
import os.path as osp
import subprocess
import sys

import pytest
import yaml

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
EXPRS = osp.join(REPO, "exprs")

# every group the reference tree has (reference exprs/ dir listing)
REQUIRED_DIRS = [
    "robust_baseline_exp/resnet/resnet50",
    "robust_baseline_exp/efficientnet_nodrop/efficientnet_b7_nodrop_600",
    "robust_baseline_exp/imagenet_21k_exp/21k_vit_base_patch16_224",
    "robust_baseline_exp/imagenet_21k_exp/21k_shufflenetv2_2.0",
    "robust_baseline_exp/Test/resnet18",
    "robust_baseline_exp/Test/21k_resnet50",
    "robust_baseline_exp/vit/vit_base_patch16_224",
    "exp/models/resnet18_batch1k_epoch100_nesterov_wd0.0001",
    "exp/imagenet-a_o-loop",
    "exp/swin",
    "nips_benchmark/augmentation/mixer_B16_224",
    "nips_benchmark/ema/shufflenet_v2_x2_0",
    "nips_benchmark/label_smooth/vit_base_patch16_224",
    "nips_benchmark/pgd_adv_train/convnextv2",
    "nips_benchmark/new_adv_train/convnext_base",
    "nips_benchmark/adv_eval",
    "nips_benchmark/new_adv_eval",
    "nips_benchmark/batch_eval_adv",
    "nips_benchmark/batch_eval_transfer",
    "nips_benchmark/new_transfer",
    "nips_benchmark/test",
]


def test_required_groups_exist():
    missing = [d for d in REQUIRED_DIRS if not osp.isdir(osp.join(EXPRS, d))]
    assert not missing, f"missing exprs groups: {missing}"


def _all_yaml():
    for root, _, files in os.walk(EXPRS):
        for f in files:
            if f.endswith(".yaml"):
                yield osp.join(root, f)


def test_all_configs_parse_and_models_resolve():
    from robustart_tpu.models.registry import model_names

    names = set(model_names())
    yamls = list(_all_yaml())
    assert len(yamls) > 120
    for path in yamls:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        assert isinstance(cfg, dict), path
        for key in ("model", "model_src", "model_tgt"):
            if key in cfg:
                mtype = cfg[key]["type"]
                assert mtype in names, f"{path}: unknown model {mtype!r}"


def test_exprs_file_parity_with_reference():
    """Every file path the reference exprs/ tree has must exist here
    (cluster-specific .DS_Store excluded)."""
    ref = "/root/reference/exprs"
    if not osp.isdir(ref):
        pytest.skip("reference tree not available")
    missing = []
    for root, _, files in os.walk(ref):
        for f in files:
            if f == ".DS_Store":
                continue
            rel = osp.relpath(osp.join(root, f), ref)
            if not osp.exists(osp.join(EXPRS, rel)):
                missing.append(rel)
    assert not missing, f"{len(missing)} reference exprs files missing: {missing[:10]}"


def test_shell_scripts_have_no_cluster_launchers():
    """Launchers are TPU-native (no spring.submit/srun/torchrun leftovers)."""
    for root, _, files in os.walk(EXPRS):
        for f in files:
            if f.endswith(".sh"):
                with open(osp.join(root, f)) as fh:
                    lines = [
                        l for l in fh.read().splitlines()
                        if not l.lstrip().startswith("#")  # citations OK
                    ]
                for bad in ("spring.submit", "srun ", "torchrun"):
                    assert not any(bad in l for l in lines), (
                        f"{f} invokes {bad!r}"
                    )


def test_nips_test_group_runs_on_fake_backend(tmp_path):
    """One config from the new groups end-to-end (reference
    nips_benchmark/test/ smoke pattern)."""
    with open(osp.join(EXPRS, "nips_benchmark/test/config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["model"] = {"type": "resnet18", "kwargs": {"num_classes": 10}}
    cfg["data"].update(
        fake_size=16, fake_num_classes=10, batch_size=8, input_size=32
    )
    cfg["saver"]["save_dir"] = str(tmp_path / "ck")
    cfg["saver"]["results_path"] = str(tmp_path / "r" / "results.txt.all")
    test_cfg = str(tmp_path / "config.yaml")
    with open(test_cfg, "w") as f:
        yaml.safe_dump(cfg, f)

    from robustart_tpu.solvers.cls_solver import main

    metrics = main(["--config", test_cfg, "--evaluate"])
    assert "top1" in metrics


def test_adv_eval_config_src_tgt_vocabulary():
    """model_src/model_tgt keys present (reference adv_eval/config.yaml:1-14)."""
    with open(osp.join(EXPRS, "nips_benchmark/adv_eval/config.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert "model_src" in cfg and "model_tgt" in cfg
    assert cfg["model_src"]["type"] == "resnet50_official"


def test_parse_transfer_shim_imports():
    out = subprocess.run(
        [sys.executable, "-c",
         "import runpy, sys; sys.argv=['parse_transfer.py','--help']; "
         "runpy.run_path("
         f"'{EXPRS}/nips_benchmark/batch_eval_transfer/parse_transfer.py', "
         "run_name='__main__')"],
        capture_output=True, text=True, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-800:]
