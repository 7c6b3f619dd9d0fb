"""Numeric forward parity: torch ResNet/MobileNetV2 -> converter -> flax.

VERDICT r2 weak #7: the pretrained converters were only ever exercised on
synthetically-NAMED state_dicts — key mapping was tested, numerics were not.
These tests close that gap without torchvision/timm (absent in this image):
minimal pure-torch models with torchvision's EXACT state_dict layout and
forward semantics (torchvision.models.resnet / mobilenetv2 — public,
standard architectures; reference loads the same families via keras
classification_models, resnet_models.py:292-297), random weights, then

    torch eval forward  ==  flax eval forward(convert_torch_*(state_dict))

to ~1e-4 in f32. Padding caveat this test is designed around: XLA "SAME"
equals torch's explicit ``k//2`` padding only when every stride-2 layer sees
an ODD input extent, so inputs are 225x225 (225->113->57->29->15: odd at
every stride-2 stage). At even sizes the two frameworks pad stride-2 convs
differently (torch (3,3) vs SAME (2,3) for the 7x7 stem) — that boundary
difference is inherent to any torch->TF-style conversion and does not affect
weight correctness.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from maskrcnn_tf2_tpu.models.backbones.pretrained import (  # noqa: E402
    convert_torch_mobilenet_v2,
    convert_torch_resnet,
)
from maskrcnn_tf2_tpu.models.backbones.resnet import (  # noqa: E402
    RESNET_VARIANTS,
    ResNet,
)


# ---------------------------------------------------------------------------
# Minimal torchvision-layout ResNet (exact state_dict names + semantics)
# ---------------------------------------------------------------------------


class _TorchBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNet(tnn.Module):
    """torchvision.models.ResNet feature extractor (no avgpool/fc)."""

    def __init__(self, block, layers, groups=1, width_per_group=64):
        super().__init__()
        self.inplanes, self.groups, self.base_width = 64, groups, width_per_group
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                           bias=False),
                tnn.BatchNorm2d(planes * block.expansion),
            )
        kw = ({} if block is _TorchBasicBlock
              else dict(groups=self.groups, base_width=self.base_width))
        layers = [block(self.inplanes, planes, stride, downsample, **kw)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes, **kw) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def _randomize(model: tnn.Module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _flax_endpoints(name: str, converted, x_nhwc):
    model = ResNet(dtype=np.float32, **RESNET_VARIANTS[name])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_nhwc)
    # structural completeness: converter must produce EXACTLY the model tree
    for coll in ("params", "batch_stats"):
        want = jax.tree_util.tree_structure(variables[coll])
        got = jax.tree_util.tree_structure(converted[coll])
        assert want == got, f"{coll} tree mismatch"
    shapes_ok = jax.tree.map(
        lambda a, b: np.asarray(a).shape == np.asarray(b).shape,
        variables, converted)
    assert all(jax.tree.leaves(shapes_ok))
    return jax.jit(lambda v, x: model.apply(v, x, train_bn=False))(
        converted, x_nhwc)


@pytest.mark.parametrize("name,layers,block,kw", [
    ("resnet18", (2, 2, 2, 2), _TorchBasicBlock, {}),
    ("resnet50", (3, 4, 6, 3), _TorchBottleneck, {}),
    ("resnext50", (3, 4, 6, 3), _TorchBottleneck,
     dict(groups=32, width_per_group=4)),
])
def test_torch_resnet_forward_parity(name, layers, block, kw):
    tm = _TorchResNet(block, layers, **kw).eval()
    _randomize(tm, seed=3)
    x = torch.randn(1, 3, 225, 225, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        t_ends = [t.permute(0, 2, 3, 1).numpy() for t in tm(x)]

    converted = convert_torch_resnet(tm.state_dict())
    ends = _flax_endpoints(name, converted, np.transpose(x.numpy(), (0, 2, 3, 1)))
    for level, ref in zip(("C2", "C3", "C4", "C5"), t_ends):
        ours = np.asarray(ends[level], np.float32)
        assert ours.shape == ref.shape, level
        err = np.max(np.abs(ours - ref)) / max(1e-6, np.max(np.abs(ref)))
        assert err < 2e-4, f"{name} {level}: rel err {err}"


# ---------------------------------------------------------------------------
# Minimal torchvision-layout MobileNetV2
# ---------------------------------------------------------------------------


class _TorchConvBNReLU(tnn.Sequential):
    # BN eps=1e-3 matches OUR MobileNetV2 (keras semantics,
    # models/backbones/mobilenet.py::_conv_bn); torchvision itself uses the
    # 1e-5 default — for real checkpoints (var >> eps) the difference is
    # negligible, but the parity test pins the converter mapping exactly.
    def __init__(self, inp, oup, kernel=3, stride=1, groups=1):
        super().__init__(
            tnn.Conv2d(inp, oup, kernel, stride, (kernel - 1) // 2,
                       groups=groups, bias=False),
            tnn.BatchNorm2d(oup, eps=1e-3),
            tnn.ReLU6(inplace=True),
        )


class _TorchInvertedResidual(tnn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = int(round(inp * expand_ratio))
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(_TorchConvBNReLU(inp, hidden, kernel=1))
        layers += [
            _TorchConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
            tnn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(oup, eps=1e-3),
        ]
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class _TorchMobileNetV2(tnn.Module):
    """torchvision.models.mobilenet_v2 'features' trunk (no head conv)."""

    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self):
        super().__init__()
        feats, inp = [_TorchConvBNReLU(3, 32, stride=2)], 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                feats.append(
                    _TorchInvertedResidual(inp, c, s if i == 0 else 1, t))
                inp = c
        # features.18 (head ConvBNReLU to 1280) exists in torchvision but is
        # skipped by the converter; add it so state_dict keys match exactly.
        feats.append(_TorchConvBNReLU(inp, 1280, kernel=1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        ends = {}
        for i, m in enumerate(self.features[:-1]):
            x = m(x)
            # torchvision block indices of our C2..C5 endpoints
            ends[{3: "C2", 6: "C3", 13: "C4", 17: "C5"}.get(i, i)] = x
        return ends


def test_torch_mobilenet_v2_forward_parity():
    from maskrcnn_tf2_tpu.models.backbones.mobilenet import MobileNetV2

    tm = _TorchMobileNetV2().eval()
    _randomize(tm, seed=5)
    x = torch.randn(1, 3, 225, 225, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        t_ends = {k: v.permute(0, 2, 3, 1).numpy()
                  for k, v in tm(x).items() if isinstance(k, str)}

    converted = convert_torch_mobilenet_v2(tm.state_dict())
    model = MobileNetV2(dtype=np.float32)
    x_nhwc = np.transpose(x.numpy(), (0, 2, 3, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x_nhwc)
    for coll in ("params", "batch_stats"):
        assert (jax.tree_util.tree_structure(variables[coll])
                == jax.tree_util.tree_structure(converted[coll])), coll
    ends = jax.jit(lambda v, x: model.apply(v, x, train_bn=False))(
        converted, x_nhwc)
    for level, ref in t_ends.items():
        ours = np.asarray(ends[level], np.float32)
        assert ours.shape == ref.shape, level
        err = np.max(np.abs(ours - ref)) / max(1e-6, np.max(np.abs(ref)))
        assert err < 2e-4, f"mobilenet_v2 {level}: rel err {err}"
