"""Torch transcription oracle for the reference's vendored ConvNeXt
backbone (``aldi/backbone.py:155-355``), D2-named as
``backbone.bottom_up.{downsample_layers,stages,norm{i}}`` — the names a
reference ConvNeXt ``.pth`` carries through ``aldi/checkpoint.py:18-32``.

From-scratch transcription of the published ConvNeXt architecture spec
(4x4 patchify stem + LN; LN + 2x2 strided conv between stages; blocks of
7x7 depthwise conv -> LN -> 1x4x expand Linear -> GELU -> contract Linear
-> layer scale; per-out-stage LayerNorms).
"""

import torch
import torch.nn.functional as F
from torch import nn

from tests.torch_rcnn_oracle import NS
from tests.torch_vit_oracle import _ln_last, _ln_nchw


class _CNBlock(nn.Module):
    def __init__(self, dim, layer_scale_init=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(
            layer_scale_init * torch.ones(dim))

    def forward(self, x):  # NCHW
        shortcut = x
        y = self.dwconv(x).permute(0, 2, 3, 1)  # NHWC
        y = _ln_last(self.norm, y)
        y = self.pwconv2(F.gelu(self.pwconv1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return shortcut + y


def build_convnext(depths=(1, 1, 2, 1), dims=(8, 16, 32, 64)):
    root = NS()
    root.backbone = NS()
    bu = NS()
    ds = nn.ModuleList()
    ds.append(nn.Sequential(
        nn.Conv2d(3, dims[0], 4, 4),
        nn.LayerNorm(dims[0], eps=1e-6),
    ))
    for i in range(1, 4):
        ds.append(nn.Sequential(
            nn.LayerNorm(dims[i - 1], eps=1e-6),
            nn.Conv2d(dims[i - 1], dims[i], 2, 2),
        ))
    bu.downsample_layers = ds
    stages = nn.ModuleList()
    for i in range(4):
        stages.append(nn.Sequential(
            *[_CNBlock(dims[i]) for _ in range(depths[i])]
        ))
    bu.stages = stages
    for i in range(4):
        setattr(bu, f"norm{i}", nn.LayerNorm(dims[i], eps=1e-6))
    root.backbone.bottom_up = bu
    root._meta = dict(depths=tuple(depths), dims=tuple(dims))
    return root


@torch.no_grad()
def convnext_forward(root, x_nchw):
    """-> {res2..res5} NCHW (per-stage output LayerNorms applied)."""
    bu = root.backbone.bottom_up
    outs = {}
    t = x_nchw
    for i in range(4):
        ds = bu.downsample_layers[i]
        if i == 0:
            t = _ln_nchw(ds[1], ds[0](t))
        else:
            t = ds[1](_ln_nchw(ds[0], t))
        t = bu.stages[i](t)
        outs[f"res{i + 2}"] = _ln_nchw(getattr(bu, f"norm{i}"), t)
    return outs


def golden_d2_convnext_names(depths=(1, 1, 2, 1)):
    names = set()
    base = "backbone.bottom_up"
    for i in range(4):
        for slot in (0, 1):
            names |= {
                f"{base}.downsample_layers.{i}.{slot}.weight",
                f"{base}.downsample_layers.{i}.{slot}.bias",
            }
        names |= {f"{base}.norm{i}.weight", f"{base}.norm{i}.bias"}
        for j in range(depths[i]):
            blk = f"{base}.stages.{i}.{j}"
            names.add(f"{blk}.gamma")
            for m in ("dwconv", "norm", "pwconv1", "pwconv2"):
                names |= {f"{blk}.{m}.weight", f"{blk}.{m}.bias"}
    return names
