"""Torch transcription oracle for the YOLOv5 family the reference trains
through its detectron2 wrapper submodule (``configs/Base-Yolo.yaml:4-18``
builds ``yolov5://yolov5m.yaml`` and initializes from
``models/yolov5m_detectron2.pt`` — an ultralytics-format state dict whose
``model.{idx}.*`` module indices follow the v5 yaml layout).

From-scratch transcription of the published YOLOv5 architecture spec
(CSP backbone: 6x6/2 stem, C3 blocks, SPPF; PANet neck with nearest
2x upsampling; per-level 1x1 Detect convs; Conv = conv/BN(eps 1e-3)/SiLU),
kept deliberately independent of ``aldi_tpu/models/yolo.py`` so name-map or
layout bugs in the converter cannot cancel out.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

from tests.torch_rcnn_oracle import NS

NA, STRIDES = 3, (8, 16, 32)


def _gd(n, depth_mult):
    return max(round(n * depth_mult), 1)


def _gw(c, width_mult):
    return int(math.ceil(c * width_mult / 8) * 8)


class TConv(nn.Module):
    def __init__(self, cin, cout, k=1, s=1, p=None):
        super().__init__()
        p = k // 2 if p is None else p
        self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 1)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(nn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True):
        super().__init__()
        h = cout // 2
        self.cv1 = TConv(cin, h, 1)
        self.cv2 = TConv(cin, h, 1)
        self.cv3 = TConv(2 * h, cout, 1)
        self.m = nn.Sequential(
            *[TBottleneck(h, shortcut) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], 1))


class TSPPF(nn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        h = cin // 2
        self.cv1 = TConv(cin, h, 1)
        self.cv2 = TConv(4 * h, cout, 1)
        self.k = k

    def forward(self, x):
        x = self.cv1(x)
        pool = lambda t: F.max_pool2d(t, self.k, 1, self.k // 2)
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return self.cv2(torch.cat([x, y1, y2, y3], 1))


def build_yolov5(num_classes, depth_mult, width_mult):
    """Module whose state_dict carries exactly the ultralytics
    ``model.{idx}.*`` names for the v5 yaml layout (indices 11/12/15/16/
    19/22 are the parameter-free Upsample/Concat slots)."""
    gw = lambda c: _gw(c, width_mult)
    gd = lambda n: _gd(n, depth_mult)
    no = 5 + num_classes

    m = nn.ModuleDict()
    m["0"] = TConv(3, gw(64), 6, 2, 2)
    m["1"] = TConv(gw(64), gw(128), 3, 2)
    m["2"] = TC3(gw(128), gw(128), gd(3))
    m["3"] = TConv(gw(128), gw(256), 3, 2)
    m["4"] = TC3(gw(256), gw(256), gd(6))
    m["5"] = TConv(gw(256), gw(512), 3, 2)
    m["6"] = TC3(gw(512), gw(512), gd(9))
    m["7"] = TConv(gw(512), gw(1024), 3, 2)
    m["8"] = TC3(gw(1024), gw(1024), gd(3))
    m["9"] = TSPPF(gw(1024), gw(1024))
    m["10"] = TConv(gw(1024), gw(512), 1, 1)
    m["13"] = TC3(gw(512) + gw(512), gw(512), gd(3), shortcut=False)
    m["14"] = TConv(gw(512), gw(256), 1, 1)
    m["17"] = TC3(gw(256) + gw(256), gw(256), gd(3), shortcut=False)
    m["18"] = TConv(gw(256), gw(256), 3, 2)
    m["20"] = TC3(gw(256) + gw(256), gw(512), gd(3), shortcut=False)
    m["21"] = TConv(gw(512), gw(512), 3, 2)
    m["23"] = TC3(gw(512) + gw(512), gw(1024), gd(3), shortcut=False)
    detect = NS()
    detect.m = nn.ModuleList([
        nn.Conv2d(c, NA * no, 1)
        for c in (gw(256), gw(512), gw(1024))
    ])
    m["24"] = detect

    root = NS()
    root.model = m
    root.eval()
    return root


@torch.no_grad()
def yolo_forward(root, x):
    """x NCHW -> per-level raw predictions [B, H, W, A, 5+nc] (the layout
    ultralytics Detect views as (bs, na, no, ny, nx) then permutes)."""
    m = root.model
    x = m["2"](m["1"](m["0"](x)))
    c4 = m["4"](m["3"](x))
    c6 = m["6"](m["5"](c4))
    x = m["9"](m["8"](m["7"](c6)))
    up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")

    p5_in = m["10"](x)
    n13 = m["13"](torch.cat([up(p5_in), c6], 1))
    p4_in = m["14"](n13)
    p3 = m["17"](torch.cat([up(p4_in), c4], 1))
    p4 = m["20"](torch.cat([m["18"](p3), p4_in], 1))
    p5 = m["23"](torch.cat([m["21"](p4), p5_in], 1))

    outs = []
    for i, f in enumerate((p3, p4, p5)):
        y = m["24"].m[i](f)  # [B, na*no, H, W]
        b, _, h, w = y.shape
        no = y.shape[1] // NA
        outs.append(y.view(b, NA, no, h, w).permute(0, 3, 4, 1, 2))
    return outs


def golden_ultralytics_names(depth_mult, width_mult):
    """Every parameter/buffer name (minus num_batches_tracked) a real
    ultralytics yolov5 state dict carries for these multiples, enumerated
    by hand from the v5 yaml layout — independent of both the converter's
    name map and the oracle module above."""
    gd = lambda n: _gd(n, depth_mult)

    def conv(base):
        return [f"{base}.conv.weight", f"{base}.bn.weight", f"{base}.bn.bias",
                f"{base}.bn.running_mean", f"{base}.bn.running_var"]

    def c3(base, n):
        out = conv(f"{base}.cv1") + conv(f"{base}.cv2") + conv(f"{base}.cv3")
        for i in range(n):
            out += conv(f"{base}.m.{i}.cv1") + conv(f"{base}.m.{i}.cv2")
        return out

    names = []
    names += conv("model.0") + conv("model.1") + c3("model.2", gd(3))
    names += conv("model.3") + c3("model.4", gd(6))
    names += conv("model.5") + c3("model.6", gd(9))
    names += conv("model.7") + c3("model.8", gd(3))
    names += conv("model.9.cv1") + conv("model.9.cv2")
    names += conv("model.10") + c3("model.13", gd(3))
    names += conv("model.14") + c3("model.17", gd(3))
    names += conv("model.18") + c3("model.20", gd(3))
    names += conv("model.21") + c3("model.23", gd(3))
    for i in range(3):
        names += [f"model.24.m.{i}.weight", f"model.24.m.{i}.bias"]
    return set(names)
