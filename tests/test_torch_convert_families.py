"""Torch→Flax conversion parity for MobileNetV2 / DenseNet / ConvNeXt.

MobileNetV2 gets a full forward-parity check against a hand-built torch
module with torchvision's exact naming; DenseNet and ConvNeXt get
completeness checks against synthetic state dicts with the official key
names.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from robustart_tpu.models import create_classifier
from robustart_tpu.models.torch_convert import convert_state_dict


# --- torchvision-naming MobileNetV2 (width 1.0) ------------------------------


class TVInvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(
                nn.Sequential(
                    nn.Conv2d(inp, hidden, 1, bias=False),
                    nn.BatchNorm2d(hidden),
                    nn.ReLU6(inplace=True),
                )
            )
        layers.append(
            nn.Sequential(
                nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden, bias=False),
                nn.BatchNorm2d(hidden),
                nn.ReLU6(inplace=True),
            )
        )
        layers.append(nn.Conv2d(hidden, oup, 1, bias=False))
        layers.append(nn.BatchNorm2d(oup))
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class TVMobileNetV2(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        features = [
            nn.Sequential(
                nn.Conv2d(3, 32, 3, 2, 1, bias=False),
                nn.BatchNorm2d(32),
                nn.ReLU6(inplace=True),
            )
        ]
        inp = 32
        for t, c, n, s in cfg:
            for i in range(n):
                features.append(
                    TVInvertedResidual(inp, c, s if i == 0 else 1, t)
                )
                inp = c
        features.append(
            nn.Sequential(
                nn.Conv2d(inp, 1280, 1, bias=False),
                nn.BatchNorm2d(1280),
                nn.ReLU6(inplace=True),
            )
        )
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2), nn.Linear(1280, num_classes)
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


def test_mobilenet_v2_forward_parity():
    torch.manual_seed(0)
    net = TVMobileNetV2()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.9, 1.1)
    net.eval()
    sd = {k: v for k, v in net.state_dict().items()}

    clf = create_classifier("mobilenet_v2", rng=0, input_size=64, scale=1.0)
    variables, missing = convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, clf.variables, "MobileNetV2"
    )
    assert missing == [], missing[:6]
    clf.variables = variables

    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    with torch.no_grad():
        ref = net(
            torch.from_numpy(((x - mean) / std).transpose(0, 3, 1, 2).copy())
        ).numpy()
    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def _synthetic_state_dict(keys_shapes):
    rng = np.random.default_rng(0)
    return {
        k: rng.normal(size=s).astype(np.float32) for k, s in keys_shapes.items()
    }


def test_densenet_mapping_completeness():
    clf = create_classifier("densenet121", rng=0, input_size=64)
    from robustart_tpu.models.torch_convert import (
        _densenet_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    # every flax param must produce a well-formed torchvision key
    for name in flatten(clf.variables):
        collection, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        if leaf == "conv1_kernel":
            continue
        torch_base = _densenet_torch_name(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "None" not in key and "_BNReLUConv" not in key, (name, key)
        assert key.startswith(("features.", "classifier")), (name, key)


def test_convnext_mapping_completeness():
    clf = create_classifier("convnext_base", rng=0, input_size=64,
                            num_classes=10)
    from robustart_tpu.models.torch_convert import (
        _convnext_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        torch_base = _convnext_torch_name(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "stage0_block" not in key and "stem" not in key, (name, key)
        assert key.startswith(
            ("downsample_layers.", "stages.", "norm.", "head.")
        ), (name, key)


def test_swin_mapping_completeness():
    clf = create_classifier("swin_tiny", rng=0, input_size=224, num_classes=10)
    from robustart_tpu.models.torch_convert import (
        _swin_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        if leaf in _SUFFIX_MAP:
            torch_base = _swin_torch_name(base) if base else ""
            key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        else:
            key = _swin_torch_name(path)
        assert "stage" not in key and "merge_" not in key, (name, key)
        assert key.startswith(("patch_embed.", "layers.", "norm.", "head.")), (
            name, key,
        )
        if leaf == "relative_position_bias_table":
            assert key.endswith("attn.relative_position_bias_table")


def test_clip_mapping_completeness():
    clf = create_classifier("clip_vit_l_14", rng=0, input_size=224,
                            num_classes=10)
    from robustart_tpu.models.torch_convert import (
        _clip_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        if leaf in ("zero_shot_weights", "logit_scale"):
            continue  # framework-side head, no torch counterpart
        if leaf in _SUFFIX_MAP:
            torch_base = _clip_torch_name(base) if base else ""
            key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        else:
            key = _clip_torch_name(path)
        assert "resblock0/" not in key, (name, key)
        assert key.startswith("visual."), (name, key)


def test_shufflenet_mapping_completeness():
    clf = create_classifier("shufflenet_v2_x1_0", rng=0, input_size=64)
    from robustart_tpu.models.torch_convert import (
        _shufflenet_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        torch_base = _shufflenet_torch_name(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "_ConvBN" not in key and "ShuffleUnit" not in key, (name, key)
        assert key.startswith(
            ("conv1.", "conv5.", "stage", "fc.", "weight", "bias")
        ), (name, key)


def test_repvgg_mapping_completeness():
    clf = create_classifier("repvgg_A0", rng=0, input_size=64, num_classes=10)
    from robustart_tpu.models.torch_convert import (
        _repvgg_torch_name,
        _SUFFIX_MAP,
        flatten,
    )

    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        torch_base = _repvgg_torch_name(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "conv3x3" not in key and "bn_id" not in key, (name, key)
        assert key.startswith(("stage", "linear")), (name, key)


def test_efficientnet_mapping_completeness():
    from robustart_tpu.models.torch_convert import _SUFFIX_MAP, flatten, resolve_rule

    clf = create_classifier("efficientnet_b2", rng=0, input_size=64)
    rule = resolve_rule(clf.module)
    seen_stages = set()
    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        torch_base = rule(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "MBConv" not in key and "_ConvBNSiLU" not in key, (name, key)
        assert key.startswith(("features.", "classifier.")), (name, key)
        m = key.split(".")
        if m[0] == "features" and m[1] not in ("0", "8"):
            seen_stages.add(int(m[1]))
    assert seen_stages == set(range(1, 8))  # all 7 MBConv stages present


def test_regnet_mapping_completeness():
    from robustart_tpu.models.torch_convert import _SUFFIX_MAP, flatten, resolve_rule

    clf = create_classifier("regnety_400m", rng=0, input_size=64)
    rule = resolve_rule(clf.module)
    for name in flatten(clf.variables):
        _, _, path = name.partition("/")
        leaf = path.rsplit("/", 1)[-1]
        base = path.rsplit("/", 1)[0] if "/" in path else ""
        torch_base = rule(base) if base else ""
        key = f"{torch_base}.{_SUFFIX_MAP[leaf]}" if torch_base else _SUFFIX_MAP[leaf]
        assert "XBlock" not in key and "_b" not in key.split(".")[0][2:], (name, key)
        assert key.startswith(("stem.", "s", "head.")), (name, key)
        if "se_" in name:
            assert ".se.f_ex." in key
