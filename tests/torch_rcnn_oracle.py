"""Torch transcription oracle for the D2 R50-FPN / RPN-head / box-head
forward (the pycocotools-oracle pattern, VERDICT r2 missing #1).

An independent torch implementation whose ``state_dict()`` carries the
EXACT detectron2 module names a reference checkpoint would
(``aldi/checkpoint.py:18-32`` loads D2-named ``.pkl``/``.pth`` files;
``configs/detectron2/Base-RCNN-FPN.yaml:3-4`` pins R50-FPN). Used by
test_torch_parity.py to verify (a) the checkpoint converter's name map is
exhaustive against a real-shaped state dict it did NOT generate, and
(b) the Flax forward matches torch numerically after conversion.

Transcribed from the substrate behavior spec (SURVEY.md section 2.2:
FrozenBN, caffe-style stride-in-1x1 bottlenecks, FPN lateral/output convs
with nearest top-down, shared RPN head, 2-fc box head) — detectron2 itself
is not installed here; this is a from-scratch transcription, not a copy.
"""

import torch
import torch.nn.functional as F
from torch import nn


class FrozenBN(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * weight + bias, all buffers."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))
        self.eps = eps

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


def conv_bn(cin, cout, k, s):
    conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
    conv.norm = FrozenBN(cout)  # D2 attaches norm to the conv module
    return conv


class Bottleneck(nn.Module):
    def __init__(self, cin, bott, cout, stride, shortcut):
        super().__init__()
        self.conv1 = conv_bn(cin, bott, 1, stride)  # stride-in-1x1
        self.conv2 = conv_bn(bott, bott, 3, 1)
        self.conv3 = conv_bn(bott, cout, 1, 1)
        if shortcut:
            self.shortcut = conv_bn(cin, cout, 1, stride)

    def forward(self, x):
        out = F.relu(self.conv1.norm(self.conv1(x)))
        out = F.relu(self.conv2.norm(self.conv2(out)))
        out = self.conv3.norm(self.conv3(out))
        sc = (
            self.shortcut.norm(self.shortcut(x))
            if hasattr(self, "shortcut") else x
        )
        return F.relu(out + sc)


class NS(nn.Module):
    """Bare namespace module: children register under attribute names."""


R50_BLOCKS = {2: 3, 3: 4, 4: 6, 5: 3}


def build_r50_fpn_rcnn(num_classes=3, num_anchors=3):
    root = NS()
    bu = NS()
    bu.stem = NS()
    bu.stem.conv1 = conv_bn(3, 64, 7, 2)
    cin, bott, cout = 64, 64, 256
    for s, n in R50_BLOCKS.items():
        stage = nn.Sequential(*[
            Bottleneck(
                cin if b == 0 else cout, bott, cout,
                stride=(1 if s == 2 else 2) if b == 0 else 1,
                shortcut=(b == 0),
            )
            for b in range(n)
        ])
        setattr(bu, f"res{s}", stage)
        cin, bott, cout = cout, bott * 2, cout * 2

    backbone = NS()
    backbone.bottom_up = bu
    for s, cl in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        setattr(backbone, f"fpn_lateral{s}", nn.Conv2d(cl, 256, 1))
        setattr(backbone, f"fpn_output{s}", nn.Conv2d(256, 256, 3, 1, 1))
    root.backbone = backbone

    root.proposal_generator = NS()
    rh = NS()
    rh.conv = nn.Conv2d(256, 256, 3, 1, 1)
    rh.objectness_logits = nn.Conv2d(256, num_anchors, 1)
    rh.anchor_deltas = nn.Conv2d(256, num_anchors * 4, 1)
    root.proposal_generator.rpn_head = rh

    root.roi_heads = NS()
    bh = NS()
    bh.fc1 = nn.Linear(256 * 7 * 7, 1024)
    bh.fc2 = nn.Linear(1024, 1024)
    root.roi_heads.box_head = bh
    bp = NS()
    bp.cls_score = nn.Linear(1024, num_classes + 1)
    bp.bbox_pred = nn.Linear(1024, num_classes * 4)
    root.roi_heads.box_predictor = bp
    return root


@torch.no_grad()
def backbone_forward(root, x):
    """x [B, 3, H, W] -> {p2..p6} NCHW."""
    bu = root.backbone.bottom_up
    t = F.relu(bu.stem.conv1.norm(bu.stem.conv1(x)))
    t = F.max_pool2d(t, 3, 2, 1)
    feats = {}
    for s in (2, 3, 4, 5):
        t = getattr(bu, f"res{s}")(t)
        feats[s] = t
    lat = {
        s: getattr(root.backbone, f"fpn_lateral{s}")(feats[s])
        for s in (2, 3, 4, 5)
    }
    merged = {5: lat[5]}
    for s in (4, 3, 2):
        merged[s] = lat[s] + F.interpolate(
            merged[s + 1], scale_factor=2, mode="nearest"
        )
    outs = {
        f"p{s}": getattr(root.backbone, f"fpn_output{s}")(merged[s])
        for s in (2, 3, 4, 5)
    }
    outs["p6"] = F.max_pool2d(outs["p5"], 1, 2)
    return outs


@torch.no_grad()
def rpn_forward(root, feats_nchw):
    """-> per-level (logits [B, HWA], deltas [B, HWA, 4]), (h, w, a)
    raster order matching the Flax head's NHWC flatten."""
    rh = root.proposal_generator.rpn_head
    logits, deltas = [], []
    for f in feats_nchw:
        t = F.relu(rh.conv(f))
        lg = rh.objectness_logits(t)  # [B, A, H, W]
        dl = rh.anchor_deltas(t)  # [B, A*4, H, W]
        b, a, h, w = lg.shape
        logits.append(lg.permute(0, 2, 3, 1).reshape(b, -1))
        deltas.append(
            dl.view(b, a, 4, h, w).permute(0, 3, 4, 1, 2).reshape(b, -1, 4)
        )
    return logits, deltas


@torch.no_grad()
def box_head_forward(root, pooled_nchw):
    """pooled [N, C, 7, 7] -> (cls_logits [N, K+1], deltas [N, K*4])."""
    bh = root.roi_heads.box_head
    x = pooled_nchw.flatten(1)  # NCHW flatten: the layout the converter's
    # fc1 permutation exists for
    x = F.relu(bh.fc1(x))
    x = F.relu(bh.fc2(x))
    bp = root.roi_heads.box_predictor
    return bp.cls_score(x), bp.bbox_pred(x)


@torch.no_grad()
def randomize(root, seed=0):
    """Deterministic variance-preserving random weights (50 conv layers:
    naive N(0, s) either vanishes or explodes)."""
    g = torch.Generator().manual_seed(seed)

    def rnd(shape):
        return torch.randn(shape, generator=g)

    for name, p in list(root.named_parameters()) + list(
        root.named_buffers()
    ):
        if name.endswith("running_var"):
            p.copy_(torch.rand(p.shape, generator=g) + 0.5)
        elif name.endswith("running_mean"):
            p.copy_(rnd(p.shape) * 0.1)
        elif name.endswith(("norm.weight", "bn.weight")):
            p.copy_(1.0 + 0.1 * rnd(p.shape))
        elif p.ndim >= 2:
            fan_in = p[0].numel()
            p.copy_(rnd(p.shape) * fan_in ** -0.5)
        else:
            p.copy_(rnd(p.shape) * 0.01)
    return root


def golden_d2_r50_fpn_names(num_classes=3, num_anchors=3):
    """The EXACT D2 state-dict key set for R50-FPN + RPN + 2fc box head,
    written out structurally (independent of the converter under test)."""
    names = set()

    def fbn(base):
        return {
            f"{base}.norm.{leaf}"
            for leaf in ("weight", "bias", "running_mean", "running_var")
        }

    names.add("backbone.bottom_up.stem.conv1.weight")
    names |= fbn("backbone.bottom_up.stem.conv1")
    for s, n in R50_BLOCKS.items():
        for b in range(n):
            base = f"backbone.bottom_up.res{s}.{b}"
            for c in ("conv1", "conv2", "conv3"):
                names.add(f"{base}.{c}.weight")
                names |= fbn(f"{base}.{c}")
            if b == 0:
                names.add(f"{base}.shortcut.weight")
                names |= fbn(f"{base}.shortcut")
    for s in (2, 3, 4, 5):
        for kind in ("lateral", "output"):
            names |= {
                f"backbone.fpn_{kind}{s}.weight",
                f"backbone.fpn_{kind}{s}.bias",
            }
    for m in ("conv", "objectness_logits", "anchor_deltas"):
        names |= {
            f"proposal_generator.rpn_head.{m}.weight",
            f"proposal_generator.rpn_head.{m}.bias",
        }
    for m in ("fc1", "fc2"):
        names |= {
            f"roi_heads.box_head.{m}.weight",
            f"roi_heads.box_head.{m}.bias",
        }
    for m in ("cls_score", "bbox_pred"):
        names |= {
            f"roi_heads.box_predictor.{m}.weight",
            f"roi_heads.box_predictor.{m}.bias",
        }
    return names
