"""Torch transcription oracle for the D2 ViTDet trunk + SimpleFeaturePyramid
forward (extends the pycocotools/R50-oracle pattern to the ViT family).

An independent torch implementation whose ``state_dict()`` carries the EXACT
detectron2 module names a reference ViTDet checkpoint would
(``backbone.net.{patch_embed,pos_embed,blocks.N.*}`` and
``backbone.simfp_{stage}.{slot}`` — reference ``aldi/backbone.py:37-64``
instantiates ``common/models/mask_rcnn_vitdet.py``). Used by
test_torch_parity_vit.py to verify the converter's ViT name map against a
state dict it did NOT generate, the MAE-style ``pos_embed`` class-token
layout, and numerical forward parity of the Flax trunk/SFP.

Transcribed from the substrate behavior spec (SURVEY.md section 2.2: plain
ViT with decomposed relative position embeddings, window attention, SFP
scale branches) — detectron2 is not installed here; this is a from-scratch
transcription, not a copy.
"""

import torch
import torch.nn.functional as F
from torch import nn

from tests.torch_rcnn_oracle import NS


def _ln_last(ln, x):
    """Apply an nn.LayerNorm module over the LAST axis of any tensor."""
    return F.layer_norm(x, (x.shape[-1],), ln.weight, ln.bias, ln.eps)


def _ln_nchw(ln, x):
    """Channel LayerNorm on NCHW (D2's channels-first LayerNorm)."""
    return _ln_last(ln, x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


def _conv_norm(cin, cout, k, pad):
    conv = nn.Conv2d(cin, cout, k, 1, pad, bias=False)
    conv.norm = nn.LayerNorm(cout, eps=1e-6)  # D2 attaches norm to the conv
    return conv


def build_vit_trunk(embed_dim=32, depth=3, num_heads=2, patch_size=16,
                    window_size=4, global_blocks=(1,), pretrain_grid=8,
                    use_cls_token=True):
    """NS tree named as ``backbone.net.*`` in a real D2 state dict."""
    root = NS()
    root.backbone = NS()
    net = NS()
    pe = NS()
    pe.proj = nn.Conv2d(3, embed_dim, patch_size, patch_size)
    net.patch_embed = pe
    tokens = pretrain_grid * pretrain_grid + (1 if use_cls_token else 0)
    net.pos_embed = nn.Parameter(torch.zeros(1, tokens, embed_dim))
    head_dim = embed_dim // num_heads
    blocks = nn.ModuleList()
    for i in range(depth):
        blk = NS()
        blk.norm1 = nn.LayerNorm(embed_dim, eps=1e-6)
        attn = NS()
        attn.qkv = nn.Linear(embed_dim, embed_dim * 3)
        attn.proj = nn.Linear(embed_dim, embed_dim)
        ws = 0 if i in global_blocks else window_size
        rel = ws if ws > 0 else pretrain_grid
        attn.rel_pos_h = nn.Parameter(torch.zeros(2 * rel - 1, head_dim))
        attn.rel_pos_w = nn.Parameter(torch.zeros(2 * rel - 1, head_dim))
        blk.attn = attn
        blk.norm2 = nn.LayerNorm(embed_dim, eps=1e-6)
        mlp = NS()
        mlp.fc1 = nn.Linear(embed_dim, embed_dim * 4)
        mlp.fc2 = nn.Linear(embed_dim * 4, embed_dim)
        blk.mlp = mlp
        blocks.append(blk)
    net.blocks = blocks
    root.backbone.net = net
    root._meta = dict(num_heads=num_heads, window_size=window_size,
                      global_blocks=tuple(global_blocks),
                      use_cls_token=use_cls_token)
    return root


def _get_rel_pos(q_size, k_size, rel_pos):
    assert rel_pos.shape[0] == 2 * max(q_size, k_size) - 1
    rel = (torch.arange(q_size)[:, None] - torch.arange(k_size)[None, :]
           + (k_size - 1))
    return rel_pos[rel.long()]  # [q, k, hd]


def _attn_forward(attn, x, num_heads):
    """x [B, H, W, C] -> [B, H, W, C] with decomposed rel-pos bias."""
    b, h, w, c = x.shape
    hd = c // num_heads
    n = h * w
    qkv = attn.qkv(x.reshape(b, n, c))
    qkv = qkv.reshape(b, n, 3, num_heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, nh, N, hd]
    scale = hd ** -0.5
    logits = (q * scale) @ k.transpose(-2, -1)  # [B, nh, N, N]

    rh = _get_rel_pos(h, h, attn.rel_pos_h)
    rw = _get_rel_pos(w, w, attn.rel_pos_w)
    rq = q.reshape(b, num_heads, h, w, hd)
    bias_h = torch.einsum("bnhwd,hkd->bnhwk", rq, rh)
    bias_w = torch.einsum("bnhwd,wkd->bnhwk", rq, rw)
    logits = (logits.view(b, num_heads, h, w, h, w)
              + bias_h[..., :, None] + bias_w[..., None, :]
              ).reshape(b, num_heads, n, n)

    out = logits.softmax(-1) @ v  # [B, nh, N, hd]
    out = out.transpose(1, 2).reshape(b, h, w, c)
    return attn.proj(out)


def _window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp * wp // ws // ws)
    x = x.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


@torch.no_grad()
def vit_forward(root, x_nchw):
    """x [B, 3, H, W] -> trunk feature [B, H/ps, W/ps, C] (NHWC)."""
    meta = root._meta
    net = root.backbone.net
    x = net.patch_embed.proj(x_nchw).permute(0, 2, 3, 1)  # NHWC
    pos = net.pos_embed
    if meta["use_cls_token"]:
        pos = pos[:, 1:]
    p = int(pos.shape[1] ** 0.5)
    pos = pos.reshape(1, p, p, -1)
    assert pos.shape[1:3] == x.shape[1:3], "oracle avoids pos interpolation"
    x = x + pos
    for i, blk in enumerate(net.blocks):
        shortcut = x
        y = _ln_last(blk.norm1, x)
        hw = (y.shape[1], y.shape[2])
        ws = 0 if i in meta["global_blocks"] else meta["window_size"]
        if ws > 0:
            y, pad_hw = _window_partition(y, ws)
        y = _attn_forward(blk.attn, y, meta["num_heads"])
        if ws > 0:
            y = _window_unpartition(y, ws, pad_hw, hw)
        x = shortcut + y
        y = _ln_last(blk.norm2, x)
        y = blk.mlp.fc2(F.gelu(blk.mlp.fc1(y)))
        x = x + y
    return x


def build_sfp(dim=32, out_channels=16):
    """NS named ``backbone.simfp_{2..5}.{slot}`` per the substrate
    Sequential layout (see checkpoint_convert.sfp_name)."""
    root = NS()
    root.backbone = NS()
    root.backbone.simfp_2 = nn.Sequential(
        nn.ConvTranspose2d(dim, dim // 2, 2, 2),
        nn.LayerNorm(dim // 2, eps=1e-6),
        nn.GELU(),
        nn.ConvTranspose2d(dim // 2, dim // 4, 2, 2),
        _conv_norm(dim // 4, out_channels, 1, 0),
        _conv_norm(out_channels, out_channels, 3, 1),
    )
    root.backbone.simfp_3 = nn.Sequential(
        nn.ConvTranspose2d(dim, dim // 2, 2, 2),
        _conv_norm(dim // 2, out_channels, 1, 0),
        _conv_norm(out_channels, out_channels, 3, 1),
    )
    root.backbone.simfp_4 = nn.Sequential(
        _conv_norm(dim, out_channels, 1, 0),
        _conv_norm(out_channels, out_channels, 3, 1),
    )
    root.backbone.simfp_5 = nn.Sequential(
        nn.MaxPool2d(2, 2),
        _conv_norm(dim, out_channels, 1, 0),
        _conv_norm(out_channels, out_channels, 3, 1),
    )
    return root


@torch.no_grad()
def sfp_forward(root, trunk_nhwc):
    """trunk [B, H, W, C] -> {p2..p6} NCHW."""
    t = trunk_nhwc.permute(0, 3, 1, 2)
    outs = {}
    for stage in (2, 3, 4, 5):
        y = t
        for mod in getattr(root.backbone, f"simfp_{stage}"):
            if isinstance(mod, nn.LayerNorm):
                y = _ln_nchw(mod, y)
            else:
                y = mod(y)
                if hasattr(mod, "norm"):
                    y = _ln_nchw(mod.norm, y)
        outs[f"p{stage}"] = y
    outs["p6"] = F.max_pool2d(outs["p5"], 1, 2)
    return outs


def golden_d2_vit_names(depth=3):
    """EXACT D2 state-dict key set for the ViT trunk, written structurally
    (independent of the converter under test)."""
    names = {
        "backbone.net.patch_embed.proj.weight",
        "backbone.net.patch_embed.proj.bias",
        "backbone.net.pos_embed",
    }
    for i in range(depth):
        base = f"backbone.net.blocks.{i}"
        for ln in ("norm1", "norm2"):
            names |= {f"{base}.{ln}.weight", f"{base}.{ln}.bias"}
        names |= {
            f"{base}.attn.qkv.weight", f"{base}.attn.qkv.bias",
            f"{base}.attn.proj.weight", f"{base}.attn.proj.bias",
            f"{base}.attn.rel_pos_h", f"{base}.attn.rel_pos_w",
        }
        names |= {
            f"{base}.mlp.fc1.weight", f"{base}.mlp.fc1.bias",
            f"{base}.mlp.fc2.weight", f"{base}.mlp.fc2.bias",
        }
    return names


def golden_d2_sfp_names():
    names = set()
    slots = {
        2: (("0", True), ("1", True), ("3", True), ("4", False),
            ("4.norm", True), ("5", False), ("5.norm", True)),
        3: (("0", True), ("1", False), ("1.norm", True),
            ("2", False), ("2.norm", True)),
        4: (("0", False), ("0.norm", True), ("1", False), ("1.norm", True)),
        5: (("1", False), ("1.norm", True), ("2", False), ("2.norm", True)),
    }
    for stage, ss in slots.items():
        for slot, has_bias in ss:
            names.add(f"backbone.simfp_{stage}.{slot}.weight")
            if has_bias:
                names.add(f"backbone.simfp_{stage}.{slot}.bias")
    return names
