"""Validate the torchvision-ResNet porter against an in-test torch
re-implementation that uses torchvision's exact module names (torchvision
itself is absent in this environment)."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from hcunet_tpu.models.resnet import ResNet
from hcunet_tpu.utils.port_torchvision import resnet50_variables_from_torchvision


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50Body(nn.Module):
    """torchvision-named resnet50 feature extractor (conv1/bn1/layer1..4)."""

    def __init__(self, stages=(3, 4, 6, 3), width=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = width
        for s, n in enumerate(stages):
            planes = width * (2**s)
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 0) else 1
                blocks.append(TorchBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = {}
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            feats[f"c{s + 2}"] = x
        return feats


@pytest.mark.parametrize("seed", [0])
def test_resnet50_port_forward_parity(seed):
    torch.manual_seed(seed)
    # small width keeps the test fast; stage structure identical to resnet50
    net = TorchResNet50Body(stages=(3, 4, 6, 3), width=16).eval()
    variables = resnet50_variables_from_torchvision(net.state_dict())

    model = ResNet(stage_sizes=(3, 4, 6, 3), width=16)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    got = model.apply(variables, np.transpose(x.numpy(), (0, 2, 3, 1)), train=False)
    for lvl in ("c2", "c3", "c4", "c5"):
        w = np.transpose(want[lvl].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(got[lvl]), w, atol=1e-4, rtol=1e-4,
        )
