"""YOLO weight-converter golden test against real torch math.

The round-1 converter test was a self-inverse round trip — it could not
catch a transposed kernel, a BN-eps mismatch, or a padding-grid shift.
Here the YOLOv8n graph is re-declared in pure torch with ultralytics
state_dict key names (module indices per models/yolo/convert.py:9-15),
every weight AND BatchNorm running statistic randomized, converted with
ultralytics_yolov8_to_flax, and the two forwards compared per level.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pose6d_tpu.models.yolo.convert import ultralytics_yolov8_to_flax
from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8

NC = 13


class _Conv(torch.nn.Module):
    # ultralytics `Conv`: Conv2d(bias=False) + BN(eps 1e-3, momentum .03) + SiLU
    def __init__(self, ci, co, k=1, s=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.bn = torch.nn.BatchNorm2d(co, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class _Bottleneck(torch.nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = _Conv(c, c, 3)
        self.cv2 = _Conv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class _C2f(torch.nn.Module):
    def __init__(self, ci, co, n=1, shortcut=False):
        super().__init__()
        self.h = co // 2
        self.cv1 = _Conv(ci, 2 * self.h, 1)
        self.cv2 = _Conv((2 + n) * self.h, co, 1)
        self.m = torch.nn.ModuleList(_Bottleneck(self.h, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class _SPPF(torch.nn.Module):
    def __init__(self, ci, co, k=5):
        super().__init__()
        self.cv1 = _Conv(ci, ci // 2, 1)
        self.cv2 = _Conv(ci * 2, co, 1)
        self.mp = torch.nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.mp(x)
        y2 = self.mp(y1)
        return self.cv2(torch.cat([x, y1, y2, self.mp(y2)], 1))


class _TorchYoloV8n(torch.nn.Module):
    """yolov8n graph with ultralytics key layout ('model.{idx}.'); the
    upsample/concat slots (10/11/13/14/17/20) are weightless Identity
    placeholders so indices line up."""

    def __init__(self, nc=NC):
        super().__init__()
        nn = torch.nn
        cb = max(16, 64 // 4, 16 * 4)  # c_box = 64
        cc = max(64, min(nc, 100))  # c_cls = 64
        detect = nn.Module()
        detect.cv2 = nn.ModuleList(
            nn.Sequential(_Conv(ci, cb, 3), _Conv(cb, cb, 3), nn.Conv2d(cb, 64, 1))
            for ci in (64, 128, 256)
        )
        detect.cv3 = nn.ModuleList(
            nn.Sequential(_Conv(ci, cc, 3), _Conv(cc, cc, 3), nn.Conv2d(cc, nc, 1))
            for ci in (64, 128, 256)
        )
        self.model = nn.ModuleList(
            [
                _Conv(3, 16, 3, 2),            # 0 stem
                _Conv(16, 32, 3, 2),           # 1
                _C2f(32, 32, 1, True),         # 2
                _Conv(32, 64, 3, 2),           # 3
                _C2f(64, 64, 2, True),         # 4 -> p3
                _Conv(64, 128, 3, 2),          # 5
                _C2f(128, 128, 2, True),       # 6 -> p4
                _Conv(128, 256, 3, 2),         # 7
                _C2f(256, 256, 1, True),       # 8
                _SPPF(256, 256),               # 9 -> p5
                nn.Identity(), nn.Identity(),  # 10 upsample, 11 concat
                _C2f(384, 128, 1, False),      # 12 td_p4
                nn.Identity(), nn.Identity(),  # 13 upsample, 14 concat
                _C2f(192, 64, 1, False),       # 15 td_p3
                _Conv(64, 64, 3, 2),           # 16 bu_down3
                nn.Identity(),                 # 17 concat
                _C2f(192, 128, 1, False),      # 18 bu_p4
                _Conv(128, 128, 3, 2),         # 19 bu_down4
                nn.Identity(),                 # 20 concat
                _C2f(384, 256, 1, False),      # 21 bu_p5
                detect,                        # 22
            ]
        )

    def forward(self, x):
        m = self.model
        up = lambda t: torch.nn.functional.interpolate(t, scale_factor=2, mode="nearest")
        x = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))
        t4 = m[12](torch.cat([up(p5), p4], 1))
        t3 = m[15](torch.cat([up(t4), p3], 1))
        b4 = m[18](torch.cat([m[16](t3), t4], 1))
        b5 = m[21](torch.cat([m[19](b4), p5], 1))
        det = m[22]
        return [
            (det.cv2[i](f), det.cv3[i](f)) for i, f in enumerate((t3, b4, b5))
        ]


def test_yolo_converter_matches_torch_forward(rng):
    torch.manual_seed(0)
    tmodel = _TorchYoloV8n().eval()
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for mod in tmodel.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn(mod.running_mean.shape, generator=g) * 0.2)
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
                mod.weight.copy_(torch.rand(mod.weight.shape, generator=g) + 0.5)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.1)

    cfg = YoloConfig(num_classes=NC)
    params, stats = ultralytics_yolov8_to_flax(tmodel.state_dict(), cfg)

    x = rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = YoloV8(cfg).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    assert len(ours) == 3
    for lvl, ((obox, ocls), (tbox, tcls)) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(obox), tbox.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=1e-4, err_msg=f"box level {lvl}",
        )
        np.testing.assert_allclose(
            np.asarray(ocls), tcls.numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=1e-4, err_msg=f"cls level {lvl}",
        )

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
