"""Generate the exprs/ experiment tree (reference exprs/; SURVEY.md §2.7).

One config.yaml + run.sh/eval.sh per (architecture × technique), with the
reference's YAML schema, adapted to this framework's solvers and with
dataset paths parameterized via the ROBUSTART_DATA environment variable.
Run: python tools/gen_exprs.py
"""

from __future__ import annotations

import os
import os.path as osp

import yaml

ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "exprs")

DATA_ROOT = "${ROBUSTART_DATA:-/data/robustart}"

BASELINE_MODELS = {
    # dir -> (model.type, kwargs, per-device batch)
    "resnet/resnet18": ("resnet18_official", {}, 32),
    "resnet/resnet34": ("resnet34_official", {}, 32),
    "resnet/resnet50": ("resnet50_official", {}, 32),
    "resnet/resnet101": ("resnet101_official", {}, 32),
    "resnet/resnet152": ("resnet152_official", {}, 32),
    "wide_resnet/wide_resnet50_2": ("wide_resnet50_2", {}, 32),
    "wide_resnet/wide_resnet101_2": ("wide_resnet101_2", {}, 32),
    "resnext/resnext50_32x4d": ("resnext50_32x4d", {}, 32),
    "resnext/resnext101_32x8d": ("resnext101_32x8d", {}, 32),
    "densenet/densenet121": ("densenet121", {}, 32),
    "densenet/densenet169": ("densenet169", {}, 32),
    "densenet/densenet201": ("densenet201", {}, 32),
    "mobilenet_v2/mobilenet_v2_x0_5": ("mobilenet_v2", {"scale": 0.5}, 32),
    "mobilenet_v2/mobilenet_v2_x0_75": ("mobilenet_v2", {"scale": 0.75}, 32),
    "mobilenet_v2/mobilenet_v2_x1_0": ("mobilenet_v2", {"scale": 1.0}, 32),
    "mobilenet_v2/mobilenet_v2_x1_4": ("mobilenet_v2", {"scale": 1.4}, 32),
    "shufflenetv2/shufflenetv2_0.5": ("shufflenet_v2_x0_5", {}, 32),
    "shufflenetv2/shufflenetv2_1.0": ("shufflenet_v2_x1_0", {}, 32),
    "shufflenetv2/shufflenetv2_1.5": ("shufflenet_v2_x1_5", {}, 32),
    "shufflenetv2/shufflenetv2_2.0": ("shufflenet_v2_x2_0", {}, 32),
    "regnetx/regnetx_400m": ("regnetx_400m", {}, 32),
    "regnetx/regnetx_800m": ("regnetx_800m", {}, 32),
    "regnetx/regnetx_1600m": ("regnetx_1600m", {}, 32),
    "regnetx/regnetx_3200m": ("regnetx_3200m", {}, 32),
    "regnetx/regnetx_6400m": ("regnetx_6400m", {}, 32),
    "repvgg/repvgg_A0": ("repvgg_A0", {}, 32),
    "repvgg/repvgg_B3": ("repvgg_B3", {}, 32),
    "vit/vit_base_patch16_224": (
        "vit_b16_224",
        {"drop_path": 0.0, "dropout": 0.0, "attention_dropout": 0.0,
         "qkv_bias": True},
        32,
    ),
    "vit/vit_base_patch32_224": (
        "vit_b32_224",
        {"drop_path": 0.0, "dropout": 0.0, "attention_dropout": 0.0,
         "qkv_bias": True},
        32,
    ),
    "deit/deit_tiny_patch16_224": ("deit_tiny_b16_224", {}, 32),
    "deit/deit_small_patch16_224": ("deit_small_b16_224", {}, 32),
    "deit/deit_base_patch16_224": ("deit_base_b16_224", {}, 32),
    "mlp_mixer/mixer_b16_224": ("mixer_b16_224", {"drop_path": 0.0}, 32),
    "mlp_mixer/mixer_L16_224": ("mixer_L16_224", {"drop_path": 0.0}, 32),
}
# plain + nodrop efficientnet trees, incl. the larger-input-size variants
# (reference exprs/robust_baseline_exp/efficientnet{,_nodrop}/ listing)
_EFFNET_SIZES = {1: 240, 2: 260, 3: 300, 4: 380, 5: 456, 6: 528, 7: 600}
for i in range(8):
    BASELINE_MODELS[f"efficientnet/efficientnet_b{i}"] = (
        f"efficientnet_b{i}", {}, 32,
    )
    BASELINE_MODELS[f"efficientnet_nodrop/efficientnet_b{i}_nodrop"] = (
        f"efficientnet_b{i}_nodrop", {}, 32,
    )
    if i in _EFFNET_SIZES:
        size = _EFFNET_SIZES[i]
        BASELINE_MODELS[
            f"efficientnet_nodrop/efficientnet_b{i}_nodrop_{size}"
        ] = (f"efficientnet_b{i}_nodrop", {"input_size": size}, 16)

MOBILENET_V3_SCALES = [0.35, 0.5, 0.75, 1.0, 1.4]
for s in MOBILENET_V3_SCALES:
    BASELINE_MODELS[f"mobilenet_v3/mobilenet_v3_large_x{str(s).replace('.', '_')}"] = (
        "mobilenet_v3", {"scale": s, "dropout": 0.0, "mode": "large"}, 32,
    )


def base_config(model_type, kwargs, batch_size, read_from="fs"):
    kwargs = dict(kwargs)
    input_size = int(kwargs.pop("input_size", 224))
    test_resize = round(input_size * 8 / 7)  # reference val resize ratio
    return {
        "model": {"type": model_type, "kwargs": {
            **kwargs, "bn": {"use_sync_bn": False, "kwargs": {}},
        }},
        "dist": {"sync": False},
        "seed": 0,
        "optimizer": {
            "type": "SGD",
            "kwargs": {"momentum": 0.9, "nesterov": True,
                       "weight_decay": 0.0001},
        },
        "lr_scheduler": {
            "type": "CosineEpoch",
            "kwargs": {"base_lr": 0.1, "warmup_lr": 0.4, "warmup_epoch": 2,
                       "max_epoch": 100, "min_lr": 0.0},
        },
        "label_smooth": 0.1,
        "ema": {"enable": True, "kwargs": {"decay": 0.9999}},
        "data": {
            "type": "imagenet",
            "read_from": read_from,
            "use_dali": False,
            "batch_size": batch_size,
            "num_workers": 8,
            "input_size": input_size,
            "test_resize": test_resize,
            "train": {
                "root_dir": f"{DATA_ROOT}/images/train/",
                "meta_file": f"{DATA_ROOT}/images/meta/train.txt",
                "image_reader": {"type": "pil"},
                "sampler": {"type": "distributed_iteration"},
                "transforms": {"type": "STANDARD"},
            },
            "test": {
                "root_dir": f"{DATA_ROOT}/images/val/",
                "meta_file": f"{DATA_ROOT}/images/meta/val.txt",
                "image_reader": {"type": "pil"},
                "sampler": {"type": "distributed"},
                "transforms": {"type": "ONECROP"},
                "evaluator": {"type": "imagenet", "kwargs": {"topk": [1, 5]}},
            },
        },
        "saver": {
            "print_freq": 10,
            "val_freq": 5000,
            "save_many": False,
            "save_dir": "checkpoints",
        },
    }


RUN_SH = """#!/bin/bash
# data-parallel training on all local TPU devices (replaces the reference's
# `spring.submit run -n16 --gpu` NCCL launcher, resnet50/run.sh:1-2)
python -u -m robustart_tpu.solvers.cls_solver --config config.yaml "$@"
# resume: add --recover=checkpoints/ckpt.msgpack
"""

EVAL_SH = """#!/bin/bash
python -u -m robustart_tpu.solvers.{solver} --config {config} --evaluate "$@"
"""


def write(path, content):
    os.makedirs(osp.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if isinstance(content, dict):
            yaml.safe_dump(content, f, sort_keys=False)
        else:
            f.write(content)
    if path.endswith(".sh"):
        os.chmod(path, 0o755)


def main():
    # robust_baseline_exp
    for rel, (mtype, kwargs, bs) in BASELINE_MODELS.items():
        d = osp.join(ROOT, "robust_baseline_exp", rel)
        write(osp.join(d, "config.yaml"), base_config(mtype, kwargs, bs))
        write(osp.join(d, "run.sh"), RUN_SH)

    # smoke-test configs (reference exprs/robust_baseline_exp/Test/)
    test_cfg = base_config("resnet18_official", {}, 8, read_from="fake")
    test_cfg["data"]["fake_size"] = 64
    test_cfg["lr_scheduler"]["kwargs"]["max_epoch"] = 1
    write(osp.join(ROOT, "robust_baseline_exp", "Test", "resnet18",
                   "config.yaml"), test_cfg)
    write(osp.join(ROOT, "robust_baseline_exp", "Test", "resnet18", "run.sh"),
          RUN_SH)

    # ImageNet-21k pretraining (reference imagenet_21k_exp: num_classes 21841,
    # ranked_iteration sampler — 21k_resnet50/config.yaml:4,53; full dir
    # listing: 21k_{resnet50, mobilenet_v3_large_x1_4, regnetx_3200m,
    # shufflenetv2_2.0, vit_base_patch16_224})
    MODELS_21K = {
        "21k_resnet50": ("resnet50_official", {}),
        "21k_mobilenet_v3_large_x1_4": (
            "mobilenet_v3", {"scale": 1.4, "dropout": 0.0, "mode": "large"}),
        "21k_regnetx_3200m": ("regnetx_3200m", {}),
        "21k_shufflenetv2_2.0": ("shufflenet_v2_x2_0", {}),
        "21k_vit_base_patch16_224": ("vit_b16_224", {"qkv_bias": True}),
    }
    for dname, (mtype, kwargs) in MODELS_21K.items():
        cfg21k = base_config(mtype, {**kwargs, "num_classes": 21841}, 32)
        cfg21k["data"]["train"]["sampler"]["type"] = "ranked_iteration"
        d = osp.join(ROOT, "robust_baseline_exp", "imagenet_21k_exp", dname)
        write(osp.join(d, "config.yaml"), cfg21k)
        write(osp.join(d, "run.sh"), RUN_SH)

    # 21k smoke-eval config (reference robust_baseline_exp/Test/21k_resnet50)
    t21k = base_config(
        "resnet50_official", {"num_classes": 21841}, 8, read_from="fake"
    )
    t21k["data"]["fake_size"] = 64
    t21k["data"]["train"]["sampler"]["type"] = "ranked_iteration"
    d = osp.join(ROOT, "robust_baseline_exp", "Test", "21k_resnet50")
    write(osp.join(d, "config.yaml"), t21k)
    write(osp.join(d, "run.sh"), RUN_SH)

    # batch eval via eval_list (reference exprs/exp/swin/config.yaml:8-10) —
    # string entries are model names, as in the reference
    swin_cfg = base_config("swin_base", {}, 64)
    swin_cfg["eval_list"] = ["swin_base_224", "swin_base_384", "swin_small",
                             "swin_tiny"]
    write(osp.join(ROOT, "exp", "swin", "config.yaml"), swin_cfg)
    write(osp.join(ROOT, "exp", "swin", "eval.sh"),
          EVAL_SH.format(solver="cls_solver", config="config.yaml"))

    # the NAS-era batch list (reference swin/config.yaml:8, full enumeration)
    nas_cfg = base_config("resnext50_32x4d", {"num_classes": 1000}, 64)
    nas_cfg["eval_list"] = [
        "regnetx_3200m", "regnetx_4000m", "regnetx_6400m",
        "regnety_200m", "regnety_400m", "regnety_600m", "regnety_800m",
        "regnety_1600m", "regnety_3200m", "regnety_4000m", "regnety_6400m",
    ] + [f"bignas_resnet18_{b}M" for b in
         [9, 37, 50, 49, 65, 107, 125, 150, 312, 403, 492, 1555]] + [
        "bignas_det_resnet18_1930M", "bignas_resnet50_2954M",
        "bignas_resnet50_3145M", "bignas_resnet50_3811M",
        "dmcp_resnet18_47M", "dmna_resnet18_1800M",
        "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5",
        "shufflenet_v2_x2_0",
    ] + [f"oneshot_supcell_{b}M" for b in
         [9, 27, 37, 55, 70, 91, 96, 113, 168, 304, 1710, 3072]] + [
        "crnas_resnet18c", "crnas_resnet50c", "crnas_resnet101c",
    ] + [f"efficientnet_b{i}" for i in range(8)] + [
        f"mobilenet_v3_{m}_x{str(s).replace('.', '_')}"
        for m in ("small", "large") for s in (0.35, 0.5, 0.75, 1.0, 1.4)
    ] + ["googlenet"]
    write(osp.join(ROOT, "exp", "swin_2", "config.yaml"), nas_cfg)
    write(osp.join(ROOT, "exp", "swin_2", "eval.sh"),
          EVAL_SH.format(solver="cls_solver", config="config.yaml"))

    # eval loops (reference exprs/exp/: one config per eval model — the 8
    # newer-model configs from exp/imagenet-a_o-loop/ listing, plus our
    # resnet50/mixer extras for smoke coverage)
    loop_models = {
        "vit_base": ("vit_base", {"qkv_bias": True}),
        "vit_base_cvst": ("vit_base_cvst", {}),
        "convnext_base": ("convnext_base", {}),
        "convnext_base_cvst": ("convnext_base_cvst", {}),
        "convnextv2_base": ("convnextv2_base", {}),
        "clip_openai": ("clip_vit_l_14", {}),
        "clip_fare2": ("clip_vit_l_14_fare2_clip", {}),
        "clip_tecoa2": ("clip_vit_l_14_tecoa2_clip", {}),
        "resnet50": ("resnet50_official", {}),
        "mixer_b16": ("mixer_b16_224", {}),
    }
    loops = {
        "imagenet-a_o-loop": ("imgnet_a_o_eval_solver", {"imagenet_a&o": True}),
        "imagenet-p-loop-mini": ("imgnet_p_eval_solver", {"imagenet_p": True}),
        "imagenet_c_loop_mini": (
            "multi_eval_solver",
            {"imagenet_c": True, "imagenet_c_online": True},
        ),
        "imagenet_s_loop": (
            "multi_eval_decoder_resize_solver",
            {"imagenet_s": True, "save_acc_var_neg": True,
             "limit_samples": 1000},
        ),
    }
    for loop, (solver, test_flags) in loops.items():
        for mname, (mtype, kwargs) in loop_models.items():
            cfg = base_config(mtype, kwargs, 64)
            cfg["data"]["test"].update(test_flags)
            cfg["data"]["test"]["transforms"] = {
                "type": "JUSTNORM" if loop == "imagenet-p-loop-mini" else "ONECROP"
            }
            cfg["saver"]["pretrain"] = {
                "path": f"{DATA_ROOT}/ckpt/{mname}.pth.tar",
                "ignore": {"key": [], "model": []},
            }
            cfg["saver"]["results_dir"] = f"results/{loop}/{mname}"
            fname = f"config_{mname}.yaml"
            write(osp.join(ROOT, "exp", loop, fname),
                  cfg)
        write(
            osp.join(ROOT, "exp", loop, "eval.sh"),
            EVAL_SH.format(solver=solver, config="config_vit_base.yaml"),
        )

    # nips_benchmark technique ablations (reference exprs/nips_benchmark/)
    techniques = {
        "augmentation": {"mixup": 0.2, "cutmix": 1.0},
        "ema": {"ema": {"enable": True, "kwargs": {"decay": 0.9999}}},
        "label_smooth": {"label_smooth": 0.1},
        "pgd_adv_train": {
            "adv_train": {
                "enable": True, "attack": "pgd_linf",
                "kwargs": {"eps": 0.01569, "rel_stepsize": 0.333, "steps": 3},
            },
            "dist": {"sync": True},
        },
        "new_adv_train": {
            "adv_train": {
                "enable": True, "attack": "pgd_linf",
                "kwargs": {"eps": 0.01569, "rel_stepsize": 0.333, "steps": 3},
            },
            "optimizer": {
                "type": "AdamW",
                "kwargs": {"betas": [0.9, 0.999], "weight_decay": 0.05},
                "no_wd": True,
            },
        },
    }
    # arch lists per technique match the reference dir listings
    # (nips_benchmark/{augmentation,ema,label_smooth}/: 6 archs;
    # pgd_adv_train/: those + vit_base + convnext_base + convnextv2;
    # new_adv_train/: vit_base + convnext_base + convnextv2)
    COMMON_ABLATION_ARCHS = [
        ("resnet50", ("resnet50_official", {}, 32)),
        ("mixer_B16_224", ("mixer_b16_224", {"drop_path": 0.0}, 32)),
        ("mobilenet_v3_large_x1_4",
         ("mobilenet_v3", {"scale": 1.4, "dropout": 0.0, "mode": "large"}, 32)),
        ("regnetx3200m", ("regnetx_3200m", {}, 32)),
        ("shufflenet_v2_x2_0", ("shufflenet_v2_x2_0", {}, 32)),
        ("vit_base_patch16_224",
         ("vit_b16_224", {"drop_path": 0.0, "qkv_bias": True}, 32)),
    ]
    NEW_ARCHS = [
        ("vit_base", ("vit_base", {"qkv_bias": True}, 32)),
        ("convnext_base", ("convnext_base", {"num_classes": 1000}, 32)),
        ("convnextv2", ("convnextv2_base", {"num_classes": 1000}, 32)),
    ]
    TECH_ARCHS = {
        "augmentation": COMMON_ABLATION_ARCHS,
        "ema": COMMON_ABLATION_ARCHS,
        "label_smooth": COMMON_ABLATION_ARCHS,
        "pgd_adv_train": COMMON_ABLATION_ARCHS + NEW_ARCHS,
        "new_adv_train": [COMMON_ABLATION_ARCHS[0]] + NEW_ARCHS,
    }
    for tech, overrides in techniques.items():
        for arch, (mtype, kwargs, bs) in TECH_ARCHS[tech]:
            cfg = base_config(mtype, kwargs, bs)
            cfg.update({k: v for k, v in overrides.items()})
            d = osp.join(ROOT, "nips_benchmark", tech, arch)
            write(osp.join(d, "config.yaml"), cfg)
            solver = (
                "adv_cls_solver_train_pgd" if "adv" in tech else "cls_solver"
            )
            write(
                osp.join(d, "run.sh"),
                f"#!/bin/bash\npython -u -m robustart_tpu.solvers.{solver} "
                "--config config.yaml \"$@\"\n",
            )

    # adversarial benchmark grid (reference batch_eval_adv/eval.sh:9-13)
    grid = [
        ("fgsm", [0.5, 2, 8]), ("pgd_linf", [0.5, 2, 8]),
        ("autoattack_linf", [0.5, 2, 8]), ("mim_linf", [0.5, 2, 8]),
        ("pgd_l2", [0.5, 2, 8]), ("pgd_l1", [100, 400, 1600]),
    ]
    lines = [
        "#!/bin/bash",
        "# full attack x eps grid (reference batch_eval_adv/eval.sh:9-13)",
        "SRC=${1:?src model name}; SRC_PATH=${2:?src ckpt}",
        "TGT=${3:-$SRC}; TGT_PATH=${4:-$SRC_PATH}",
    ]
    for attack, epss in grid:
        for eps in epss:
            lines.append(
                "python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config config.yaml --src_name $SRC --src_path $SRC_PATH "
                "--tgt_name $TGT --tgt_path $TGT_PATH "
                f"--attack {attack} --eps {eps}"
            )
    adv_dir = osp.join(ROOT, "nips_benchmark", "batch_eval_adv")
    cfg = base_config("resnet50_official", {}, 32)
    write(osp.join(adv_dir, "config.yaml"), cfg)
    write(osp.join(adv_dir, "eval.sh"), "\n".join(lines) + "\n")

    _gen_adv_eval_groups()
    _gen_exp_extras()

    count = sum(len(files) for _, _, files in os.walk(ROOT))
    print(f"generated {count} files under {ROOT}")


# the eps grid shared by the adv-eval scripts (reference
# nips_benchmark/new_adv_eval/eval.sh:13-16: eps_small/mid/large per attack)
ADV_GRID = [
    ("fgsm", ["0.5/255", "2/255", "8/255"]),
    ("pgd_linf", ["0.5/255", "2/255", "8/255"]),
    ("autoattack_linf", ["0.5/255", "2/255", "8/255"]),
    ("mim_linf", ["0.5/255", "2/255", "8/255"]),
    ("pgd_l2", ["0.5", "2.0", "8.0"]),
    ("pgd_l1", ["100.0", "400.0", "1600.0"]),
]

# the newer-model eval set (reference new_adv_eval/eval.sh:18-27 model_names)
NEW_EVAL_MODELS = [
    "convnext_base", "convnextv2_base", "convnext_base_cvst",
    "vit_base", "vit_base_cvst",
    "clip_vit_l_14", "clip_vit_l_14_fare2_clip", "clip_vit_l_14_tecoa2_clip",
]


def _src_tgt_config(src="resnet50_official", tgt="resnet50_official"):
    """config.yaml with model_src/model_tgt (reference
    nips_benchmark/adv_eval/config.yaml:1-14 vocabulary)."""
    cfg = base_config(src, {}, 32)
    model = cfg.pop("model")
    tgt_model = {"type": tgt, "kwargs": dict(model["kwargs"])}
    return {"model_src": model, "model_tgt": tgt_model, **cfg}


def _bash_model_loop(models, body, header=""):
    lines = ["#!/bin/bash", "# idempotent: a finished dir has results.txt.all",
             header]
    lines.append("model_names=(" + " ".join(f"'{m}'" for m in models) + ")")
    lines.append('CKPT_DIR=${ROBUSTART_CKPT:-"${ROBUSTART_DATA:-/data/robustart}/ckpt"}')
    lines.append("for name in \"${model_names[@]}\"; do")
    lines.append(body)
    lines.append("done")
    return "\n".join(l for l in lines if l) + "\n"


def _gen_adv_eval_groups():
    """adv_eval / new_adv_eval / batch_eval_transfer / new_transfer / test
    (reference nips_benchmark/{adv_eval,new_adv_eval,batch_eval_transfer,
    new_transfer,test}/)."""
    # ---- adv_eval: single-model attack sweep over the baseline zoo
    d = osp.join(ROOT, "nips_benchmark", "adv_eval")
    write(osp.join(d, "config.yaml"), _src_tgt_config())
    grid_lines = []
    for attack, epss in ADV_GRID:
        for eps in epss:
            grid_lines.append(
                "  python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config config.yaml --src_name $name "
                '--src_path "$CKPT_DIR/$name.pth.tar" '
                "--tgt_name $name --tgt_path \"$CKPT_DIR/$name.pth.tar\" "
                f"--attack {attack} --eps {eps}"
            )
    write(
        osp.join(d, "eval.sh"),
        _bash_model_loop(
            ["resnet50_official", "vit_b16_224", "mixer_b16_224"],
            "\n".join(grid_lines),
            header="# attack x eps sweep per model "
            "(reference adv_eval/eval.sh grid)",
        ),
    )
    # 4-line ckpt key inspector (reference nips_benchmark/adv_eval/test.py:1-4)
    write(
        osp.join(d, "test.py"),
        "import sys\n\n"
        "from robustart_tpu.tools.inspect_ckpt import main\n\n"
        "main(sys.argv[1:])\n",
    )

    # ---- new_adv_eval: the 8 newer models
    d = osp.join(ROOT, "nips_benchmark", "new_adv_eval")
    write(osp.join(d, "config.yaml"), _src_tgt_config("convnext_base"))
    grid_lines = []
    for attack, epss in ADV_GRID:
        for eps in epss:
            grid_lines.append(
                "  python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config config.yaml --src_name $name "
                '--src_path "$CKPT_DIR/$name.pth.tar" '
                "--tgt_name $name --tgt_path \"$CKPT_DIR/$name.pth.tar\" "
                f"--attack {attack} --eps {eps}"
            )
    write(
        osp.join(d, "eval.sh"),
        _bash_model_loop(
            NEW_EVAL_MODELS,
            "\n".join(grid_lines),
            header="# newer-model eval set "
            "(reference new_adv_eval/eval.sh:18-27)",
        ),
    )

    # ---- batch_eval_transfer: src→tgt FGSM transfer matrix
    d = osp.join(ROOT, "nips_benchmark", "batch_eval_transfer")
    write(osp.join(d, "config.yaml"), _src_tgt_config())
    transfer = [
        "#!/bin/bash",
        "# src x tgt x eps FGSM transfer matrix; idempotent by results.txt.all",
        "# (reference batch_eval_transfer/batch_eval_adv_transfer_auto_arch.sh)",
        "model_names=('resnet50_official' 'vit_b16_224' 'mixer_b16_224')",
        'CKPT_DIR=${ROBUSTART_CKPT:-"${ROBUSTART_DATA:-/data/robustart}/ckpt"}',
        "eps_list=('8/255' '2/255' '0.5/255')",
        "dir_name=('fgsm_0.031' 'fgsm_0.007' 'fgsm_0.001')",
        "for ((i=0;i<${#eps_list[@]};i++)); do",
        "  for src in \"${model_names[@]}\"; do",
        "    for tgt in \"${model_names[@]}\"; do",
        '      out="${src}_To_${tgt}/${dir_name[$i]}"',
        '      if [ -f "$out/results.txt.all" ]; then continue; fi',
        "      python -u -m robustart_tpu.solvers.benchmark_eval_adv "
        "--config config.yaml --src_name $src "
        '--src_path "$CKPT_DIR/$src.pth.tar" --tgt_name $tgt '
        '--tgt_path "$CKPT_DIR/$tgt.pth.tar" --attack fgsm '
        "--eps ${eps_list[$i]}",
        "    done",
        "  done",
        "done",
    ]
    write(
        osp.join(d, "batch_eval_adv_transfer_auto_arch.sh"),
        "\n".join(transfer) + "\n",
    )
    # transfer-matrix parser CLI (reference batch_eval_transfer/
    # parse_transfer.py:22-46; implementation robustart_tpu/tools/)
    write(
        osp.join(d, "parse_transfer.py"),
        "import sys\n\n"
        "from robustart_tpu.tools.parse_transfer import main\n\n"
        "main(sys.argv[1:])\n",
    )

    # ---- new_transfer: transfer matrix over the newer-model set
    d = osp.join(ROOT, "nips_benchmark", "new_transfer")
    write(osp.join(d, "config.yaml"), _src_tgt_config("convnext_base"))
    body = []
    for attack, epss in ADV_GRID:
        for eps in epss:
            body.append(
                "    python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config config.yaml --src_name $name "
                '--src_path "$CKPT_DIR/$name.pth.tar" --tgt_name $tgt '
                '--tgt_path "$CKPT_DIR/$tgt.pth.tar" '
                f"--attack {attack} --eps {eps}"
            )
    write(
        osp.join(d, "eval.sh"),
        _bash_model_loop(
            NEW_EVAL_MODELS,
            "  for tgt in \"${model_names[@]}\"; do\n"
            + "\n".join(body)
            + "\n  done",
            header="# newer-model transfer matrix "
            "(reference new_transfer/eval.sh)",
        ),
    )

    # ---- test: fake-backend smoke eval (reference nips_benchmark/test/)
    d = osp.join(ROOT, "nips_benchmark", "test")
    cfg = base_config("resnet18_official", {}, 8, read_from="fake")
    cfg["data"]["fake_size"] = 64
    write(osp.join(d, "config.yaml"), cfg)
    write(
        osp.join(d, "eval.sh"),
        EVAL_SH.format(solver="cls_solver", config="config.yaml"),
    )

    # ---- batch_eval_adv extras (reference batch_eval_adv/ listing)
    d = osp.join(ROOT, "nips_benchmark", "batch_eval_adv")
    single = []
    for attack, epss in ADV_GRID:
        for eps in epss:
            single.append(
                "python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config config.yaml --src_name $NAME --src_path $CKPT "
                "--tgt_name $NAME --tgt_path $CKPT "
                f"--attack {attack} --eps {eps}"
            )
    write(
        osp.join(d, "batch_eval_single_model.sh"),
        "#!/bin/bash\n"
        "# full grid for ONE model "
        "(reference batch_eval_adv/batch_eval_single_model.sh)\n"
        "NAME=${1:?model name}; CKPT=${2:?ckpt path}\n"
        + "\n".join(single)
        + "\n",
    )
    clip_cfg = _src_tgt_config("clip_vit_l_14", "clip_vit_l_14")
    write(osp.join(d, "clip_config.yaml"), clip_cfg)
    clip_lines = ["#!/bin/bash",
                  "# CLIP tower adversarial eval "
                  "(reference batch_eval_adv/clip_eval.sh)",
                  "CKPT=${1:?clip ckpt path}"]
    for attack, epss in ADV_GRID:
        for eps in epss:
            clip_lines.append(
                "python -u -m robustart_tpu.solvers.benchmark_eval_adv "
                "--config clip_config.yaml --src_name clip_vit_l_14 "
                "--src_path $CKPT --tgt_name clip_vit_l_14 --tgt_path $CKPT "
                f"--attack {attack} --eps {eps}"
            )
    write(osp.join(d, "clip_eval.sh"), "\n".join(clip_lines) + "\n")
    # HF → state-dict converter (reference batch_eval_adv/load_model.py:1-9
    # converts facebook/convnext-base-224; ours reads a local HF dir — this
    # environment has no network egress)
    write(
        osp.join(d, "load_model.py"),
        '"""Convert a local HuggingFace convnext checkpoint dir to a plain\n'
        'state-dict .pth (reference nips_benchmark/batch_eval_adv/\n'
        'load_model.py:1-9, which pulls facebook/convnext-base-224).\n'
        'Usage: python load_model.py <hf_dir> <out.pth>"""\n'
        "import sys\n\n"
        "import torch\n"
        "from transformers import ConvNextForImageClassification\n\n"
        "model = ConvNextForImageClassification.from_pretrained(sys.argv[1])\n"
        "torch.save(model.state_dict(), sys.argv[2])\n",
    )


def _gen_exp_extras():
    """exp/models + exp/eval_all.sh (reference exprs/exp/)."""
    # step-LR resnet18 recipe (reference exp/models/
    # resnet18_batch1k_epoch100_nesterov_wd0.0001/config.yaml: batch 1k
    # global, Step scheduler on iterations, max_iter 125000)
    d = osp.join(
        ROOT, "exp", "models", "resnet18_batch1k_epoch100_nesterov_wd0.0001"
    )
    cfg = base_config("resnet18", {}, 128)
    cfg["dist"]["sync"] = True
    cfg["lr_scheduler"] = {
        "type": "Step",
        "kwargs": {
            "lr_steps": [37500, 75000, 112500],
            "lr_mults": [0.1, 0.1, 0.1],
            "base_lr": 0.1,
            "warmup_lr": 0.4,
            "warmup_steps": 2500,
            "max_iter": 125000,
        },
    }
    write(osp.join(d, "config.yaml"), cfg)
    write(osp.join(d, "run.sh"), RUN_SH)

    # run-every-eval-loop driver (reference exp/eval_all.sh)
    write(
        osp.join(ROOT, "exp", "eval_all.sh"),
        "#!/bin/bash\nset -euo pipefail\n"
        'ROOT="$(cd "$(dirname "$0")" && pwd)"\n'
        "TASKS=(imagenet_c_loop_mini imagenet_s_loop "
        "imagenet-a_o-loop imagenet-p-loop-mini)\n"
        'for task in "${TASKS[@]}"; do\n'
        '  echo "[task] ${task}"\n'
        '  (cd "${ROOT}/${task}" && bash eval.sh)\n'
        "done\n",
    )


if __name__ == "__main__":
    main()
