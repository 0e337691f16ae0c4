"""Torch→Flax forward-parity fixtures: DenseNet / ShuffleNetV2 / ConvNeXt(V2)
/ RepVGG (VERDICT r1 item 5 — golden parity per conversion family).

Each test builds a reduced-size torch model with the family's OFFICIAL
checkpoint naming (tests/torch_ref_models.py), converts its state dict with
the production rules, and asserts the Flax forward equals the torch forward
to float tolerance — the same check MobileNetV2 already had. Reference
semantics: ``saver.pretrain`` warm start (reference
exprs/robust_baseline_exp/resnet/resnet50/config.yaml:69-79).
"""

import numpy as np
import pytest
import torch

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.torch_convert import convert_state_dict

from tests.torch_ref_models import (
    DXRepVGG,
    FBConvNeXt,
    TVDenseNet,
    TVShuffleNetV2,
    jitter_bn_stats,
)

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _assert_parity(torch_net, clf, family, size=64, atol=5e-4, rtol=1e-3):
    torch_net.eval()
    sd = {k: v.numpy() for k, v in torch_net.state_dict().items()
          if "num_batches_tracked" not in k}
    variables, missing = convert_state_dict(sd, clf.variables, family)
    assert missing == [], missing[:8]
    clf.variables = variables

    x = np.random.default_rng(0).uniform(0, 1, (2, size, size, 3))
    x = x.astype(np.float32)
    with torch.no_grad():
        ref = torch_net(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2).copy())
        ).numpy()
    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol)


def test_densenet_forward_parity():
    from robustart_tpu.models.densenet import DenseNet

    torch.manual_seed(0)
    net = TVDenseNet(block_config=(2, 2, 2), growth=8, init_feat=16)
    jitter_bn_stats(net)
    module = DenseNet(
        block_config=(2, 2, 2), growth_rate=8, num_init_features=16,
        num_classes=10,
    )
    clf = init_classifier("densenet_mini", module, rng=0, input_size=64)
    _assert_parity(net, clf, "DenseNet")


def test_shufflenet_forward_parity():
    from robustart_tpu.models.shufflenet import ShuffleNetV2

    torch.manual_seed(1)
    net = TVShuffleNetV2(
        stage_channels=(48, 96, 192, 256), stage_repeats=(2, 2, 2)
    )
    jitter_bn_stats(net, 1)
    module = ShuffleNetV2(
        stage_channels=(48, 96, 192, 256), stage_repeats=(2, 2, 2),
        num_classes=10,
    )
    clf = init_classifier("shufflenet_mini", module, rng=0, input_size=64)
    _assert_parity(net, clf, "ShuffleNetV2")


def test_convnext_v1_forward_parity():
    from robustart_tpu.models.convnext import ConvNeXt

    torch.manual_seed(2)
    net = FBConvNeXt(depths=(2, 2, 2, 2), dims=(32, 64, 128, 256))
    module = ConvNeXt(
        depths=(2, 2, 2, 2), dims=(32, 64, 128, 256), num_classes=10
    )
    clf = init_classifier("convnext_mini", module, rng=0, input_size=64)
    _assert_parity(net, clf, "ConvNeXt")


def test_convnext_v2_grn_forward_parity():
    from robustart_tpu.models.convnext import ConvNeXt

    torch.manual_seed(3)
    net = FBConvNeXt(depths=(2, 2, 2, 2), dims=(32, 64, 128, 256),
                     use_grn=True)
    # non-trivial GRN params (init is zeros, which would hide bugs)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "grn" in name:
                p.uniform_(-0.5, 0.5)
    module = ConvNeXt(
        depths=(2, 2, 2, 2), dims=(32, 64, 128, 256), num_classes=10,
        use_grn=True,
    )
    clf = init_classifier("convnextv2_mini", module, rng=0, input_size=64)
    _assert_parity(net, clf, "ConvNeXt")


def test_repvgg_forward_parity():
    from robustart_tpu.models.repvgg import RepVGG

    torch.manual_seed(4)
    net = DXRepVGG(num_blocks=(1, 1, 1, 1), width_a=0.75, width_b=2.5)
    jitter_bn_stats(net, 4)
    module = RepVGG(
        num_blocks=(1, 1, 1, 1), width_a=0.75, width_b=2.5, num_classes=10
    )
    clf = init_classifier("repvgg_mini", module, rng=0, input_size=64)
    _assert_parity(net, clf, "RepVGG")


def test_efficientnet_b0_forward_parity():
    from robustart_tpu.models.efficientnet import EfficientNet

    from tests.torch_ref_models import TVEfficientNetB0, rename_efficientnet_keys

    torch.manual_seed(5)
    net = TVEfficientNetB0(num_classes=10)
    jitter_bn_stats(net, 5)
    net.eval()
    sd = rename_efficientnet_keys(
        {k: v.numpy() for k, v in net.state_dict().items()
         if "num_batches_tracked" not in k}
    )
    module = EfficientNet(num_classes=10, dropout=0.0, drop_path=0.0)
    clf = init_classifier("efficientnet_b0_mini", module, rng=0, input_size=64)
    from robustart_tpu.models.torch_convert import resolve_rule

    variables, missing = convert_state_dict(
        sd, clf.variables, resolve_rule(module)
    )
    assert missing == [], missing[:8]
    clf.variables = variables

    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(
            torch.from_numpy(((x - MEAN) / STD).transpose(0, 3, 1, 2).copy())
        ).numpy()
    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("se_ratio", [0.0, 0.25])
def test_regnet_forward_parity(se_ratio):
    from robustart_tpu.models.regnet import RegNetX, generate_widths

    from tests.torch_ref_models import PyclsRegNet

    params = dict(w0=24, wa=24.48, wm=2.54, depth=6, group_width=8)
    widths, depths = generate_widths(
        params["w0"], params["wa"], params["wm"], params["depth"],
        params["group_width"],
    )
    torch.manual_seed(6)
    net = PyclsRegNet(widths, depths, params["group_width"], se_ratio,
                      num_classes=10)
    jitter_bn_stats(net, 6)
    module = RegNetX(**params, se_ratio=se_ratio, num_classes=10)
    clf = init_classifier("regnet_mini", module, rng=0, input_size=64)
    from robustart_tpu.models.torch_convert import resolve_rule

    _assert_parity(net, clf, resolve_rule(module))
