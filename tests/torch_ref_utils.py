"""Pure-torch torchvision stand-ins for golden tests.

torchvision is not installed in this environment (only CPU torch), but the
reference model classes `import torchvision.models` at module import and
build their backbones via `models.resnet50(weights=...)`. This helper
provides (a) a state_dict- and children()-order-compatible pure-torch
resnet50 (v1.5 bottleneck, stride on conv2 — the same math
tests/test_torch_golden.py validates against our converter), and (b)
`install_fake_torchvision()`, which registers a minimal `torchvision`
module exposing `models.resnet50` / `models.ResNet50_Weights` so the
reference files import unmodified with pretrained=False.
"""

import sys
import types

import torch


class Bottleneck(torch.nn.Module):
    # torchvision Bottleneck (v1.5: stride on the 3x3 conv2), state_dict-compatible
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(torch.nn.Module):
    """Full torchvision-compatible resnet50 (incl. fc) with the exact
    children() order the reference relies on for
    `nn.Sequential(*list(resnet.children())[:-1])`
    (models/pose_net_rgb.py:20)."""

    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)

    def _make_layer(self, planes, blocks, stride):
        nn = torch.nn
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return torch.nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def install_fake_torchvision():
    """Register a minimal `torchvision(.models)` so the reference model files
    import unmodified. Only the pretrained=False path is supported."""
    if "torchvision" in sys.modules:
        return
    models_mod = types.ModuleType("torchvision.models")

    class ResNet50_Weights:  # noqa: N801 — mirrors the torchvision name
        DEFAULT = "IMAGENET1K_V2"

    def resnet50(weights=None, **kwargs):
        if weights is not None:
            raise RuntimeError(
                "fake torchvision has no pretrained weights; "
                "construct the reference models with pretrained=False"
            )
        return TorchResNet50()

    models_mod.ResNet50_Weights = ResNet50_Weights
    models_mod.resnet50 = resnet50
    tv = types.ModuleType("torchvision")
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models_mod
