"""Torch transcription oracle for the Deformable-DETR surface the reference
trains through its ``DeformableDETRDetectron2`` submodule
(``configs/Base-DETR.yaml:4-39``; checkpoint names follow the official
Deformable-DETR layout: ``backbone.0.body.*`` torchvision-R50 with frozen
BN, ``transformer.encoder/decoder.layers.{i}.*``, ``input_proj.{i}.{0,1}``,
``query_embed``, ``class_embed.{i}`` / ``bbox_embed.{i}.layers.{j}``).

From-scratch transcription of the published Deformable-DETR spec (sine
position embeddings normalized to the valid region, multi-scale deformable
attention realized with ``F.grid_sample`` exactly as the official pure-torch
fallback defines the CUDA op's semantics, pre-LN-free post-norm layers,
shared detection heads). Independent of ``aldi_tpu/models/detr.py`` so
name-map or math bugs cannot cancel out.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

from tests.torch_rcnn_oracle import NS, FrozenBN


# --------------------------------------------------------------- backbone
class TVBottleneck(nn.Module):
    """torchvision bottleneck: the stride sits on the 3x3 conv (v1.5), not
    on the 1x1 as in the caffe/D2 layout the RCNN family uses."""

    def __init__(self, cin, width, cout, stride, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = FrozenBN(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, dilation,
                               dilation=dilation, bias=False)
        self.bn2 = FrozenBN(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = FrozenBN(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), FrozenBN(cout))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(y + sc)


def build_tv_resnet50(dilation=False):
    """dilation=True is torchvision replace_stride_with_dilation on layer4:
    first block stride->1 at dilation 1 (previous_dilation), later blocks
    dilation 2."""
    body = NS()
    body.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    body.bn1 = FrozenBN(64)
    chans = [(64, 64, 256, 3, 1), (256, 128, 512, 4, 2),
             (1024 // 2, 256, 1024, 6, 2), (1024, 512, 2048, 3, 2)]
    for li, (cin, w, cout, n, s) in enumerate(chans, start=1):
        d = 2 if (dilation and li == 4) else 1
        s0 = 1 if d > 1 else s
        blocks = [TVBottleneck(cin, w, cout, s0, 1)]
        blocks += [TVBottleneck(cout, w, cout, 1, d) for _ in range(n - 1)]
        setattr(body, f"layer{li}", nn.Sequential(*blocks))
    return body


def resnet_forward(body, x):
    x = F.relu(body.bn1(body.conv1(x)))
    x = F.max_pool2d(x, 3, 2, 1)
    x = body.layer1(x)
    c3 = body.layer2(x)
    c4 = body.layer3(c3)
    c5 = body.layer4(c4)
    return c3, c4, c5


# ------------------------------------------------- deformable attention
def ms_deform_attn_core_torch(value, spatial_shapes, locations, attn):
    """The official op's semantics: per-level bilinear grid_sample
    (align_corners=False, zeros padding) at ``locations`` in [0, 1],
    weighted by ``attn``. value [B, Lv, h, d]; locations
    [B, Lq, h, L, p, 2] (x, y); attn [B, Lq, h, L, p]."""
    b, _, h, d = value.shape
    lq = locations.shape[1]
    splits = [hh * ww for hh, ww in spatial_shapes]
    vals = value.split(splits, dim=1)
    grids = 2 * locations - 1
    sampled = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        v = (vals[lvl].permute(0, 2, 3, 1)
             .reshape(b * h, d, hh, ww))
        g = grids[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
            b * h, lq, -1, 2)
        sampled.append(F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros",
            align_corners=False))  # [b*h, d, lq, p]
    s = torch.stack(sampled, dim=-2).flatten(-2)  # [b*h, d, lq, L*p]
    w = attn.permute(0, 2, 1, 3, 4).reshape(b * h, 1, lq, -1)
    out = (s * w).sum(-1)  # [b*h, d, lq]
    return out.reshape(b, h * d, lq).transpose(1, 2)  # [b, lq, h*d]


class TMSDeformAttn(nn.Module):
    def __init__(self, d_model, n_heads, n_levels, n_points):
        super().__init__()
        self.d_model, self.h = d_model, n_heads
        self.L, self.p = n_levels, n_points
        self.sampling_offsets = nn.Linear(
            d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(
            d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, src, spatial_shapes,
                pad_mask):
        b, lq, _ = query.shape
        h, L, p = self.h, self.L, self.p
        d = self.d_model // h
        value = self.value_proj(src)
        value = value.masked_fill(pad_mask[..., None], 0.0)
        value = value.view(b, -1, h, d)
        offsets = self.sampling_offsets(query).view(b, lq, h, L, p, 2)
        attn = self.attention_weights(query).view(b, lq, h, L * p)
        attn = attn.softmax(-1).view(b, lq, h, L, p)
        if reference_points.shape[-1] == 4:
            # box-refine/two-stage: offsets scale with the reference box
            ref = reference_points[:, :, None, :, None, :]
            loc = ref[..., :2] + offsets / p * ref[..., 2:] * 0.5
        else:
            normalizer = torch.tensor(
                [[ww, hh] for hh, ww in spatial_shapes],
                dtype=torch.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        out = ms_deform_attn_core_torch(value, spatial_shapes, loc, attn)
        return self.output_proj(out)


class TEncoderLayer(nn.Module):
    def __init__(self, d_model, d_ff, n_heads, n_levels, n_points):
        super().__init__()
        self.self_attn = TMSDeformAttn(d_model, n_heads, n_levels, n_points)
        self.norm1 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ff)
        self.linear2 = nn.Linear(d_ff, d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, ref, spatial_shapes, pad_mask):
        a = self.self_attn(src + pos, ref, src, spatial_shapes, pad_mask)
        src = self.norm1(src + a)
        y = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + y)


class TDecoderLayer(nn.Module):
    def __init__(self, d_model, d_ff, n_heads, n_levels, n_points):
        super().__init__()
        self.cross_attn = TMSDeformAttn(d_model, n_heads, n_levels, n_points)
        self.norm1 = nn.LayerNorm(d_model)
        self.self_attn = nn.MultiheadAttention(
            d_model, n_heads, batch_first=True)
        self.norm2 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ff)
        self.linear2 = nn.Linear(d_ff, d_model)
        self.norm3 = nn.LayerNorm(d_model)

    def forward(self, tgt, query_pos, ref, memory, spatial_shapes,
                pad_mask):
        q = tgt + query_pos
        sa, _ = self.self_attn(q, q, tgt, need_weights=False)
        tgt = self.norm2(tgt + sa)
        ca = self.cross_attn(tgt + query_pos, ref, memory, spatial_shapes,
                             pad_mask)
        tgt = self.norm1(tgt + ca)
        y = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + y)


# ----------------------------------------------------------- whole model
def build_deformable_detr(num_classes, d_model=64, d_ff=64, n_heads=8,
                          enc_layers=2, dec_layers=2, n_points=4,
                          num_queries=20, with_box_refine=False,
                          two_stage=False, dilation=False,
                          pos_embedding="sine"):
    L = 4
    root = NS()
    bb = nn.ModuleDict(
        {"0": nn.ModuleDict({"body": build_tv_resnet50(dilation)})})
    if pos_embedding == "learned":
        pe = NS()
        pe.row_embed = nn.Embedding(50, d_model // 2)
        pe.col_embed = nn.Embedding(50, d_model // 2)
        bb["1"] = pe
    root.backbone = bb
    projs = []
    for cin in (512, 1024, 2048):
        projs.append(nn.Sequential(
            nn.Conv2d(cin, d_model, 1), nn.GroupNorm(32, d_model)))
    projs.append(nn.Sequential(
        nn.Conv2d(2048, d_model, 3, 2, 1), nn.GroupNorm(32, d_model)))
    root.input_proj = nn.ModuleList(projs)

    tr = NS()
    tr.level_embed = nn.Parameter(torch.zeros(L, d_model))
    enc = NS()
    enc.layers = nn.ModuleList([
        TEncoderLayer(d_model, d_ff, n_heads, L, n_points)
        for _ in range(enc_layers)])
    tr.encoder = enc
    dec = NS()
    dec.layers = nn.ModuleList([
        TDecoderLayer(d_model, d_ff, n_heads, L, n_points)
        for _ in range(dec_layers)])
    tr.decoder = dec
    if two_stage:
        tr.enc_output = nn.Linear(d_model, d_model)
        tr.enc_output_norm = nn.LayerNorm(d_model)
        tr.pos_trans = nn.Linear(2 * d_model, 2 * d_model)
        tr.pos_trans_norm = nn.LayerNorm(2 * d_model)
    else:
        tr.reference_points = nn.Linear(d_model, 2)
    root.transformer = tr

    if not two_stage:
        root.query_embed = nn.Embedding(num_queries, 2 * d_model)

    def make_box():
        box = NS()
        box.layers = nn.ModuleList([
            nn.Linear(d_model, d_model), nn.Linear(d_model, d_model),
            nn.Linear(d_model, 4)])
        return box

    # official head-list layout: num_pred = dec_layers (+1 when two-stage,
    # the extra slot being the encoder-output head); with box refine the
    # entries are independent clones, otherwise ONE shared module repeated
    num_pred = dec_layers + 1 if two_stage else dec_layers
    if with_box_refine:
        root.class_embed = nn.ModuleList([
            nn.Linear(d_model, num_classes) for _ in range(num_pred)])
        root.bbox_embed = nn.ModuleList(
            [make_box() for _ in range(num_pred)])
    else:
        cls = nn.Linear(d_model, num_classes)
        root.class_embed = nn.ModuleList([cls] * num_pred)
        box = make_box()
        root.bbox_embed = nn.ModuleList([box] * num_pred)
    root.eval()
    return root


def sine_pos_embed(not_mask, d_model, scale=2 * math.pi):
    """not_mask [B, H, W] float (1 = valid) -> [B, d_model, H, W]."""
    half = d_model // 2
    y = not_mask.cumsum(1)
    x = not_mask.cumsum(2)
    eps = 1e-6
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / half)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()],
                     -1).flatten(3)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()],
                     -1).flatten(3)
    return torch.cat([py, px], 3).permute(0, 3, 1, 2)


def _mlp(box, x):
    x = F.relu(box.layers[0](x))
    x = F.relu(box.layers[1](x))
    return box.layers[2](x)


def _inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(eps, 1 - eps)
    return torch.log(x / (1 - x))


def proposal_pos_embed(coords_unact, d_model, scale=2 * math.pi):
    """Official ``get_proposal_pos_embed``: [B, Q, 4] unactivated coords
    -> [B, Q, 2*d_model] sine embeddings, d_model//2 dims per coord."""
    half = d_model // 2
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / half)
    p = coords_unact.sigmoid() * scale
    pos = p[..., None] / dim_t  # [B, Q, 4, half]
    pos = torch.stack([pos[..., 0::2].sin(), pos[..., 1::2].cos()],
                      -1).flatten(2)
    return pos


@torch.no_grad()
def detr_forward(root, x, image_sizes, d_model=64, with_box_refine=False,
                 two_stage=False, num_queries=20, dilation=False,
                 pos_embedding="sine"):
    """x NCHW; image_sizes [B, 2] (h, w) valid extents. Returns
    (logits [Ld, B, Q, K], boxes [Ld, B, Q, 4] cxcywh normalized, extras)
    where extras carries enc_logits/enc_boxes under two_stage."""
    b = x.shape[0]
    c3, c4, c5 = resnet_forward(root.backbone["0"]["body"], x)
    feats = [root.input_proj[i](f) for i, f in enumerate((c3, c4, c5))]
    feats.append(root.input_proj[3](c5))
    strides = (8, 16, 16, 32) if dilation else (8, 16, 32, 64)
    spatial_shapes = [tuple(f.shape[-2:]) for f in feats]

    srcs, poss, pad_masks, valid_ratios = [], [], [], []
    for lvl, (f, (hh, ww), s) in enumerate(
            zip(feats, spatial_shapes, strides)):
        rows = torch.arange(hh)[None, :, None]
        cols = torch.arange(ww)[None, None, :]
        vh = torch.ceil(image_sizes[:, 0:1].float() / s)[..., None]
        vw = torch.ceil(image_sizes[:, 1:2].float() / s)[..., None]
        valid = (rows < vh) & (cols < vw)  # [B, H, W]
        if pos_embedding == "learned":
            pe = root.backbone["1"]
            xe = pe.col_embed(torch.arange(ww))  # [W, D/2]
            ye = pe.row_embed(torch.arange(hh))  # [H, D/2]
            pos = torch.cat([xe[None].expand(hh, -1, -1),
                             ye[:, None].expand(-1, ww, -1)], -1)
            pos = pos.permute(2, 0, 1)[None].expand(b, -1, -1, -1)
        else:
            pos = sine_pos_embed(valid.float(), d_model)
        srcs.append(f.flatten(2).transpose(1, 2))
        poss.append(pos.flatten(2).transpose(1, 2)
                    + root.transformer.level_embed[lvl].view(1, 1, -1))
        pad_masks.append(~valid.reshape(b, -1))
        valid_ratios.append(
            torch.cat([vw[..., 0] / ww, vh[..., 0] / hh], -1))
    src = torch.cat(srcs, 1)
    pos = torch.cat(poss, 1)
    pad_mask = torch.cat(pad_masks, 1)
    valid_ratios = torch.stack(valid_ratios, 1)  # [B, L, 2] (x, y)

    # encoder reference points (get_reference_points semantics)
    refs = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        ry = (torch.arange(hh, dtype=torch.float32) + 0.5) / hh
        rx = (torch.arange(ww, dtype=torch.float32) + 0.5) / ww
        gy, gx = torch.meshgrid(ry, rx, indexing="ij")
        grid = torch.stack([gx, gy], -1).reshape(-1, 2)
        refs.append(grid[None] / valid_ratios[:, lvl][:, None, :])
    enc_ref = torch.cat(refs, 1)  # [B, Lv, 2]
    enc_ref = enc_ref[:, :, None, :] * valid_ratios[:, None, :, :]

    memory = src
    for layer in root.transformer.encoder.layers:
        memory = layer(memory, pos, enc_ref, spatial_shapes, pad_mask)

    extras = {}
    if two_stage:
        # gen_encoder_output_proposals: per-level grid centers over the
        # VALID extent, wh = 0.05 * 2^lvl; invalid/padded rows get inf
        # proposals and zeroed memory; logits stay unmasked (the zeroed
        # rows share one bias-driven score) and top-k runs on raw scores
        props = []
        for lvl, ((hh, ww), s) in enumerate(zip(spatial_shapes, strides)):
            vh = torch.ceil(image_sizes[:, 0:1].float() / s)  # [B, 1]
            vw = torch.ceil(image_sizes[:, 1:2].float() / s)
            gy, gx = torch.meshgrid(
                torch.arange(hh, dtype=torch.float32),
                torch.arange(ww, dtype=torch.float32), indexing="ij")
            grid = torch.stack([gx, gy], -1).reshape(-1, 2)[None]
            grid = (grid + 0.5) / torch.cat([vw, vh], 1)[:, None, :]
            wh = torch.full_like(grid, 0.05 * (2.0 ** lvl))
            props.append(torch.cat([grid, wh], -1))
        output_proposals = torch.cat(props, 1)  # [B, Lv, 4]
        prop_valid = ((output_proposals > 0.01)
                      & (output_proposals < 0.99)).all(-1, keepdim=True)
        output_proposals = torch.log(
            output_proposals / (1 - output_proposals))
        output_proposals = output_proposals.masked_fill(
            pad_mask[..., None], float("inf"))
        output_proposals = output_proposals.masked_fill(
            ~prop_valid, float("inf"))
        om = memory.masked_fill(pad_mask[..., None], 0.0)
        om = om.masked_fill(~prop_valid, 0.0)
        om = root.transformer.enc_output_norm(
            root.transformer.enc_output(om))
        enc_logits = root.class_embed[-1](om)
        enc_coords_unact = _mlp(root.bbox_embed[-1], om) + output_proposals
        extras["enc_logits"] = enc_logits
        extras["enc_boxes"] = enc_coords_unact.sigmoid()
        topk_idx = torch.topk(enc_logits[..., 0], num_queries, dim=1)[1]
        topk_unact = torch.gather(
            enc_coords_unact, 1,
            topk_idx[..., None].expand(-1, -1, 4)).detach()
        init_ref = topk_unact.sigmoid()
        pt = root.transformer.pos_trans_norm(root.transformer.pos_trans(
            proposal_pos_embed(topk_unact, d_model)))
        query_pos, tgt = torch.split(pt, d_model, dim=2)
    else:
        qe = root.query_embed.weight
        query_pos, tgt = torch.split(qe, qe.shape[1] // 2, dim=1)
        query_pos = query_pos[None].expand(b, -1, -1)
        tgt = tgt[None].expand(b, -1, -1)
        init_ref = root.transformer.reference_points(query_pos).sigmoid()

    ref = init_ref
    logits, boxes = [], []
    for i, layer in enumerate(root.transformer.decoder.layers):
        if ref.shape[-1] == 4:
            dec_ref = ref[:, :, None, :] * torch.cat(
                [valid_ratios, valid_ratios], -1)[:, None, :, :]
        else:
            dec_ref = ref[:, :, None, :] * valid_ratios[:, None, :, :]
        tgt = layer(tgt, query_pos, dec_ref, memory, spatial_shapes,
                    pad_mask)
        logits.append(root.class_embed[i](tgt))
        delta = _mlp(root.bbox_embed[i], tgt)
        if ref.shape[-1] == 4:
            new_ref = (delta + _inverse_sigmoid(ref)).sigmoid()
        else:
            xy = (delta[..., :2] + _inverse_sigmoid(ref)).sigmoid()
            new_ref = torch.cat([xy, delta[..., 2:].sigmoid()], -1)
        boxes.append(new_ref)
        if with_box_refine:
            ref = new_ref.detach()
    return torch.stack(logits), torch.stack(boxes), extras


def golden_deformable_detr_names(enc_layers=2, dec_layers=2,
                                 with_box_refine=False, two_stage=False,
                                 pos_embedding="sine"):
    """Canonical official-layout names. Without box refine the shared heads
    are listed at index 0 only (a real checkpoint additionally repeats
    class_embed/bbox_embed under indices 1..num_pred-1 with identical
    tensors); with box refine every per-layer clone is listed, plus the
    encoder head at index dec_layers under two_stage."""
    def lin(base):
        return [f"{base}.weight", f"{base}.bias"]

    def fbn(base):
        return [f"{base}.weight", f"{base}.bias",
                f"{base}.running_mean", f"{base}.running_var"]

    names = []
    bb = "backbone.0.body"
    names += [f"{bb}.conv1.weight"] + fbn(f"{bb}.bn1")
    for li, n in zip(range(1, 5), (3, 4, 6, 3)):
        for bi in range(n):
            base = f"{bb}.layer{li}.{bi}"
            for ci in (1, 2, 3):
                names += [f"{base}.conv{ci}.weight"] + fbn(f"{base}.bn{ci}")
            if bi == 0:
                names += [f"{base}.downsample.0.weight"]
                names += fbn(f"{base}.downsample.1")
    if pos_embedding == "learned":
        names += ["backbone.1.row_embed.weight",
                  "backbone.1.col_embed.weight"]
    for i in range(4):
        names += lin(f"input_proj.{i}.0") + lin(f"input_proj.{i}.1")
    names += ["transformer.level_embed"]
    for i in range(enc_layers):
        base = f"transformer.encoder.layers.{i}"
        for sub in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            names += lin(f"{base}.self_attn.{sub}")
        names += lin(f"{base}.norm1") + lin(f"{base}.linear1")
        names += lin(f"{base}.linear2") + lin(f"{base}.norm2")
    for i in range(dec_layers):
        base = f"transformer.decoder.layers.{i}"
        for sub in ("sampling_offsets", "attention_weights", "value_proj",
                    "output_proj"):
            names += lin(f"{base}.cross_attn.{sub}")
        names += [f"{base}.self_attn.in_proj_weight",
                  f"{base}.self_attn.in_proj_bias"]
        names += lin(f"{base}.self_attn.out_proj")
        names += lin(f"{base}.norm1") + lin(f"{base}.norm2")
        names += lin(f"{base}.linear1") + lin(f"{base}.linear2")
        names += lin(f"{base}.norm3")
    if two_stage:
        for sub in ("enc_output", "enc_output_norm", "pos_trans",
                    "pos_trans_norm"):
            names += lin(f"transformer.{sub}")
    else:
        names += lin("transformer.reference_points")
        names += ["query_embed.weight"]
    num_pred = dec_layers + 1 if two_stage else dec_layers
    head_idx = range(num_pred) if with_box_refine else [0]
    for hi in head_idx:
        names += lin(f"class_embed.{hi}")
        for j in range(3):
            names += lin(f"bbox_embed.{hi}.layers.{j}")
    return set(names)
