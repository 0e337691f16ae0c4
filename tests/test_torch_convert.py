"""Torch→Flax checkpoint conversion parity.

Builds a torch ResNet-18 with torchvision's exact module naming, converts its
random state dict, and checks the Flax forward matches the torch forward to
float tolerance — validating both the name mapping and the architecture
semantics (stride placement, padding, BN eval behavior, pooling).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from robustart_tpu.models import create_classifier
from robustart_tpu.models.torch_convert import (
    convert_state_dict,
    load_torch_checkpoint,
    read_torch_state_dict,
)


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 2, 1)
        self.layer2 = self._make_layer(128, 2, 2)
        self.layer3 = self._make_layer(256, 2, 2)
        self.layer4 = self._make_layer(512, 2, 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        layers = [TorchBasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(TorchBasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = TorchResNet18()
    # randomize BN stats so eval-mode parity actually tests them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    net.eval()
    return net


def test_resnet18_conversion_complete_and_forward_parity(torch_net, tmp_path):
    ckpt = tmp_path / "r18.pth.tar"
    # reference-style layout: {'state_dict': ..., 'module.' prefixes}
    sd = {"module." + k: v for k, v in torch_net.state_dict().items()}
    torch.save({"state_dict": sd}, ckpt)

    clf = create_classifier("resnet18_official", rng=0, input_size=64)
    state = read_torch_state_dict(str(ckpt))
    variables, missing = convert_state_dict(state, clf.variables, "ResNet")
    # num_batches_tracked has no flax counterpart; everything else must map
    assert missing == [], missing[:5]
    clf.variables = variables

    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(
            ((x - np.array([0.485, 0.456, 0.406], np.float32))
             / np.array([0.229, 0.224, 0.225], np.float32))
            .transpose(0, 3, 1, 2).copy()
        )).numpy()
    ours = np.asarray(clf(x))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_load_torch_checkpoint_api(torch_net, tmp_path):
    ckpt = tmp_path / "raw.pth"
    torch.save(torch_net.state_dict(), ckpt)  # raw layout
    clf = create_classifier("resnet18", rng=0, input_size=64)
    variables = load_torch_checkpoint(str(ckpt), clf)
    ours = np.asarray(
        variables["params"]["fc"]["kernel"]
    )
    ref = torch_net.state_dict()["fc.weight"].numpy().T
    np.testing.assert_allclose(ours, ref, atol=1e-6)
