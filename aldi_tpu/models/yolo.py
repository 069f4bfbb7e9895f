"""YOLOv5 detector family: architecture, assigner/loss, DAOD interface.

The reference consumes YOLOv5-m through a Detectron2 wrapper submodule
(surface reconstructed in SURVEY.md section 2.4: ``Yolo`` meta-arch built from
``yolov5://yolov5m.yaml``, loss object with ``build_targets``/gains/balance,
head output layout [..., xywh(0:4) | obj(4) | cls(5:)]) plus ALDI's plugins
(``aldi/yolo/align.py``, ``aldi/yolo/distill.py``). Everything here is
re-derived from YOLOv5 semantics pinned by the reference's config keys
(``configs/Base-Yolo.yaml:4-15``).

Static-shape notes:
- the v5 assigner ("build_targets": anchor ratio filter + center/neighbor
  cells) is reformulated over a fixed [B, G, A, 3] candidate lattice with a
  validity mask instead of gathered index lists;
- objectness targets are scatter-max into the dense grid (v5's last-write on
  duplicates is order-dependent; max is deterministic and equivalent in the
  common case).

BatchNorm lives in the ``batch_stats`` collection (momentum 0.03 as v5);
teacher/eval use running averages, matching the reference's train/eval-mode
split.
"""

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import compute_dtype, resolve_canvas
from ..ops.losses import bce_with_logits, softmax_cross_entropy
from ..ops.nms import batched_nms_keep_mask
from .rcnn import ConvDiscriminator, grad_reverse

# (depth_multiple, width_multiple) per variant, from the upstream model yamls
MULTIPLES = {
    "yolov5n": (0.33, 0.25),
    "yolov5s": (0.33, 0.50),
    "yolov5m": (0.67, 0.75),
    "yolov5l": (1.00, 1.00),
    "yolov5x": (1.33, 1.25),
}
ANCHORS = (  # pixels, per level P3/P4/P5
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)
BALANCE = (4.0, 1.0, 0.4)  # per-level objectness weights


def _gd(n, depth_mult):
    return max(round(n * depth_mult), 1)


def _gw(c, width_mult):
    return int(math.ceil(c * width_mult / 8) * 8)


class ConvBnSiLU(nn.Module):
    c: int
    k: int = 1
    s: int = 1
    p: int = -1  # -1 = autopad k//2; the 6x6 stem passes 2 explicitly (v5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2 if self.p < 0 else self.p
        x = nn.Conv(self.c, (self.k, self.k), (self.s, self.s),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=jnp.float32, name="bn",
        )(x).astype(self.dtype)
        return nn.silu(x)


class Bottleneck(nn.Module):
    c: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.c, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnSiLU(self.c, 3, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and x.shape[-1] == self.c) else y


class C3(nn.Module):
    c: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.c // 2
        a = ConvBnSiLU(h, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(h, self.shortcut, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        b = ConvBnSiLU(h, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnSiLU(self.c, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], -1), train
        )


class SPPF(nn.Module):
    c: int
    k: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x.shape[-1] // 2
        x = ConvBnSiLU(h, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(
            t, (self.k, self.k), (1, 1), padding=[(p, p), (p, p)]
        )
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBnSiLU(self.c, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], -1), train
        )


def _upsample2x(x):
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


class YOLOv5(nn.Module):
    """CSP backbone + PANet neck + Detect head. Returns per-level raw
    predictions [B, H_l, W_l, A, 5 + nc] (xywh | obj | cls)."""

    num_classes: int
    depth_mult: float = 0.67
    width_mult: float = 0.75
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gw = lambda c: _gw(c, self.width_mult)
        gd = lambda n: _gd(n, self.depth_mult)
        dt = self.dtype

        # backbone
        x = ConvBnSiLU(gw(64), 6, 2, 2, dt, name="b0")(x, train)  # P1/2
        x = ConvBnSiLU(gw(128), 3, 2, -1, dt, name="b1")(x, train)  # P2/4
        x = C3(gw(128), gd(3), True, dt, name="b2")(x, train)
        x = ConvBnSiLU(gw(256), 3, 2, -1, dt, name="b3")(x, train)  # P3/8
        c4 = C3(gw(256), gd(6), True, dt, name="b4")(x, train)
        x = ConvBnSiLU(gw(512), 3, 2, -1, dt, name="b5")(c4, train)  # P4/16
        c6 = C3(gw(512), gd(9), True, dt, name="b6")(x, train)
        x = ConvBnSiLU(gw(1024), 3, 2, -1, dt, name="b7")(c6, train)  # P5/32
        x = C3(gw(1024), gd(3), True, dt, name="b8")(x, train)
        x = SPPF(gw(1024), 5, dt, name="b9")(x, train)

        # PANet neck
        p5_in = ConvBnSiLU(gw(512), 1, 1, -1, dt, name="n10")(x, train)
        x = jnp.concatenate([_upsample2x(p5_in), c6], -1)
        n13 = C3(gw(512), gd(3), False, dt, name="n13")(x, train)
        p4_in = ConvBnSiLU(gw(256), 1, 1, -1, dt, name="n14")(n13, train)
        x = jnp.concatenate([_upsample2x(p4_in), c4], -1)
        p3 = C3(gw(256), gd(3), False, dt, name="n17")(x, train)  # P3 out
        x = ConvBnSiLU(gw(256), 3, 2, -1, dt, name="n18")(p3, train)
        x = jnp.concatenate([x, p4_in], -1)
        p4 = C3(gw(512), gd(3), False, dt, name="n20")(x, train)  # P4 out
        x = ConvBnSiLU(gw(512), 3, 2, -1, dt, name="n21")(p4, train)
        x = jnp.concatenate([x, p5_in], -1)
        p5 = C3(gw(1024), gd(3), False, dt, name="n23")(x, train)  # P5 out

        # Detect head: 1x1 conv per level
        no = 5 + self.num_classes
        na = len(ANCHORS[0])
        outs = []
        for i, f in enumerate((p3, p4, p5)):
            y = nn.Conv(na * no, (1, 1), dtype=dt, name=f"detect{i}")(f)
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h, w, na, no).astype(jnp.float32))
        return outs, (p3, p4, p5)


# ------------------------------------------------------------------ assigner
def build_targets(
    gt_boxes: jnp.ndarray,  # [B, G, 4] xyxy canvas pixels
    gt_classes: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G]
    feat_hws: Sequence[Tuple[int, int]],
    anchor_t: float = 4.0,
):
    """v5 ``build_targets``: per level, per gt, per anchor, up to 3 cells
    (center + x-neighbor + y-neighbor). Returns per-level dicts of dense
    candidate tensors [B, G, A, 3]: cell indices, validity, box targets in
    grid units, matched anchor wh (grid units)."""
    cxcywh = jnp.stack(
        [
            (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2,
            (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2,
            gt_boxes[..., 2] - gt_boxes[..., 0],
            gt_boxes[..., 3] - gt_boxes[..., 1],
        ],
        -1,
    )
    out = []
    for lvl, (stride, anchors, (fh, fw)) in enumerate(
        zip(STRIDES, ANCHORS, feat_hws)
    ):
        g = cxcywh / stride  # grid units
        anc = jnp.asarray(anchors, jnp.float32) / stride  # [A, 2]
        r = g[..., None, 2:4] / anc[None, None]  # [B, G, A, 2]
        ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)
        match = (ratio < anchor_t) & gt_valid[..., None]  # [B, G, A]

        gxy = g[..., 0:2]  # [B, G, 2]
        fx, fy = gxy[..., 0] % 1.0, gxy[..., 1] % 1.0
        cx, cy = jnp.floor(gxy[..., 0]), jnp.floor(gxy[..., 1])

        # candidate 0: center; 1: x-neighbor; 2: y-neighbor
        x_off = jnp.where(fx < 0.5, -1.0, 1.0)
        x_ok = jnp.where(
            fx < 0.5, gxy[..., 0] > 1.0, gxy[..., 0] < fw - 1.0
        )
        y_off = jnp.where(fy < 0.5, -1.0, 1.0)
        y_ok = jnp.where(
            fy < 0.5, gxy[..., 1] > 1.0, gxy[..., 1] < fh - 1.0
        )
        cand_cx = jnp.stack([cx, cx + x_off, cx], -1)  # [B, G, 3]
        cand_cy = jnp.stack([cy, cy, cy + y_off], -1)
        cand_ok = jnp.stack([jnp.ones_like(x_ok), x_ok, y_ok], -1)

        ci = jnp.clip(cand_cx, 0, fw - 1).astype(jnp.int32)
        cj = jnp.clip(cand_cy, 0, fh - 1).astype(jnp.int32)
        valid = match[..., :, None] & cand_ok[..., None, :]  # [B, G, A, 3]

        # regression target relative to each candidate cell
        txy = gxy[..., None, None, :] - jnp.stack(
            [cand_cx, cand_cy], -1
        )[..., None, :, :]  # [B, G, 1->A, 3, 2] after broadcast
        txy = jnp.broadcast_to(
            txy, valid.shape + (2,)
        )
        twh = jnp.broadcast_to(
            g[..., None, None, 2:4], valid.shape + (2,)
        )
        out.append(
            {
                "ci": jnp.broadcast_to(ci[..., None, :], valid.shape),
                "cj": jnp.broadcast_to(cj[..., None, :], valid.shape),
                "valid": valid,
                "txy": txy,  # offset of gt center from cell origin
                "twh": twh,  # gt wh in grid units
                "anchors": jnp.broadcast_to(
                    anc[None, None, :, None, :], valid.shape + (2,)
                ),
                "classes": jnp.broadcast_to(
                    gt_classes[..., None, None], valid.shape
                ),
            }
        )
    return out


def ciou(box1, box2, eps=1e-7):
    """Complete IoU between paired cxcywh boxes [..., 4] (v5 bbox_iou)."""
    b1x, b1y, b1w, b1h = (box1[..., i] for i in range(4))
    b2x, b2y, b2w, b2h = (box2[..., i] for i in range(4))
    b1x0, b1x1 = b1x - b1w / 2, b1x + b1w / 2
    b1y0, b1y1 = b1y - b1h / 2, b1y + b1h / 2
    b2x0, b2x1 = b2x - b2w / 2, b2x + b2w / 2
    b2y0, b2y1 = b2y - b2h / 2, b2y + b2h / 2
    iw = jnp.clip(jnp.minimum(b1x1, b2x1) - jnp.maximum(b1x0, b2x0), 0)
    ih = jnp.clip(jnp.minimum(b1y1, b2y1) - jnp.maximum(b1y0, b2y0), 0)
    inter = iw * ih
    union = b1w * b1h + b2w * b2h - inter + eps
    iou = inter / union
    cw = jnp.maximum(b1x1, b2x1) - jnp.minimum(b1x0, b2x0)
    ch = jnp.maximum(b1y1, b2y1) - jnp.minimum(b1y0, b2y0)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (b2x - b1x) ** 2 + (b2y - b1y) ** 2
    v = (4 / math.pi ** 2) * (
        jnp.arctan(b2w / jnp.maximum(b2h, eps))
        - jnp.arctan(b1w / jnp.maximum(b1h, eps))
    ) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def yolo_losses(
    preds: List[jnp.ndarray],  # per level [B, H, W, A, 5+nc]
    targets: List[dict],
    num_classes: int,
    box_gain: float,
    obj_gain: float,
    cls_gain: float,
    label_smoothing: float = 0.0,
):
    """v5 ComputeLoss over the dense candidate lattice."""
    lbox = 0.0
    lcls = 0.0
    lobj = 0.0
    cp = 1.0 - 0.5 * label_smoothing
    cn = 0.5 * label_smoothing
    for pi, t, bal in zip(preds, targets, BALANCE):
        b, h, w, na, no = pi.shape
        valid = t["valid"]  # [B, G, A, 3]

        # gather predictions at candidate cells
        bi = jnp.broadcast_to(
            jnp.arange(b)[:, None, None, None], valid.shape
        )
        flat = (bi * h + t["cj"]) * w + t["ci"]  # [B, G, A, 3]
        ai = jnp.broadcast_to(
            jnp.arange(na)[None, None, :, None], valid.shape
        )
        p_flat = pi.reshape(b * h * w, na, no)
        ps = p_flat[flat, ai]  # [B, G, A, 3, no]

        # box: pxy = sigmoid*2-0.5, pwh = (sigmoid*2)^2 * anchor
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * t["anchors"]
        pbox = jnp.concatenate([pxy, pwh], -1)
        tbox = jnp.concatenate([t["txy"], t["twh"]], -1)
        iou = ciou(pbox, tbox)  # [B, G, A, 3]
        vf = valid.astype(jnp.float32)
        lbox += ((1.0 - iou) * vf).sum() / jnp.maximum(vf.sum(), 1.0)

        # objectness target: scatter-max detached IoU into the dense grid
        tobj = jnp.zeros((b * h * w, na), jnp.float32)
        iou_det = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * vf
        ai = jnp.broadcast_to(
            jnp.arange(na)[None, None, :, None], valid.shape
        )
        tobj = tobj.at[flat.reshape(-1), ai.reshape(-1)].max(
            iou_det.reshape(-1)
        )
        tobj = tobj.reshape(b, h, w, na)
        lobj += bal * bce_with_logits(pi[..., 4], tobj).mean()

        # classification (BCE one-hot, only when multiclass)
        if num_classes > 1:
            tcls = (
                jax.nn.one_hot(t["classes"], num_classes) * (cp - cn) + cn
            )
            ce = bce_with_logits(ps[..., 5:], tcls).sum(-1)
            lcls += (ce * vf).sum() / jnp.maximum(
                vf.sum() * num_classes, 1.0
            ) * num_classes
    return {
        "loss_box": box_gain * lbox,
        "loss_obj": obj_gain * lobj,
        "loss_cls": cls_gain * lcls,
    }


def decode_predictions(preds, num_classes, conf_thresh):
    """Raw per-level predictions -> flat candidate set (canvas pixels).
    Returns (boxes_xyxy [B, N, 4], scores [B, N], classes [B, N],
    valid [B, N])."""
    all_boxes, all_scores, all_classes, all_valid = [], [], [], []
    for pi, stride, anchors in zip(preds, STRIDES, ANCHORS):
        b, h, w, na, no = pi.shape
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
        sig = jax.nn.sigmoid(pi)
        px = (sig[..., 0] * 2.0 - 0.5 + gx) * stride
        py = (sig[..., 1] * 2.0 - 0.5 + gy) * stride
        anc = jnp.asarray(anchors, jnp.float32)  # pixels
        pw = (sig[..., 2] * 2.0) ** 2 * anc[None, None, None, :, 0]
        ph = (sig[..., 3] * 2.0) ** 2 * anc[None, None, None, :, 1]
        boxes = jnp.stack(
            [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1
        ).reshape(b, -1, 4)
        obj = sig[..., 4].reshape(b, -1)
        cls_probs = sig[..., 5:].reshape(b, -1, num_classes)
        conf = obj[..., None] * cls_probs
        best = conf.argmax(-1)
        score = conf.max(-1)
        all_boxes.append(boxes)
        all_scores.append(score)
        all_classes.append(best.astype(jnp.int32))
        all_valid.append(score > conf_thresh)
    return (
        jnp.concatenate(all_boxes, 1),
        jnp.concatenate(all_scores, 1),
        jnp.concatenate(all_classes, 1),
        jnp.concatenate(all_valid, 1),
    )


class YoloDetector:
    """DAOD-engine detector interface for the YOLO family (same contract as
    RCNNDetector; distillation = YoloDistiller semantics,
    ``aldi/yolo/distill.py:85-151``)."""

    mutable_collections = ("batch_stats",)

    def __init__(self, cfg):
        self.cfg = cfg
        self.dtype = compute_dtype(cfg)
        self.canvas = resolve_canvas(cfg)
        y = cfg.MODEL.YOLO
        self.num_classes = y.NUM_CLASSES
        variant = cfg.MODEL.YAML.split("//")[-1].replace(".yaml", "") or "yolov5m"
        depth_mult, width_mult = MULTIPLES.get(variant, MULTIPLES["yolov5m"])
        self.module = YOLOv5(
            num_classes=self.num_classes, depth_mult=depth_mult,
            width_mult=width_mult, dtype=self.dtype,
        )
        self.img_da_enabled = cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_ENABLED
        if self.img_da_enabled:
            self.align_module = ConvDiscriminator(
                hidden_dims=(256,), dtype=self.dtype
            )
        self.pixel_mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)
        self.feat_hws = [
            (math.ceil(self.canvas[0] / s), math.ceil(self.canvas[1] / s))
            for s in STRIDES
        ]
        self.loss_gains = dict(
            box_gain=y.BOX_LOSS_GAIN, obj_gain=y.OBJ_LOSS_GAIN,
            cls_gain=y.CLS_LOSS_GAIN, label_smoothing=y.LABEL_SMOOTHING,
        )
        self.anchor_t = y.ANCHOR_T
        self.conf_thresh = y.CONF_THRESH
        self.iou_thresh = y.IOU_THRES

    # ------------------------------------------------------------ plumbing
    def init_variables(self, rng, batch_size: int = 1):
        x = jnp.zeros((batch_size, *self.canvas, 3), self.dtype)
        k1, k2 = jax.random.split(rng)
        variables = dict(jax.jit(self.module.init)(k1, x))  # see rcnn.py note
        if self.img_da_enabled:
            layer = {"p3": 256, "p4": 512, "p5": 1024}[
                self.cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_LAYER
            ]
            dim = _gw(layer, self.module.width_mult)
            av = self.align_module.init(
                k2, jnp.zeros((1, 16, 16, dim), self.dtype)
            )
            variables["params"] = dict(variables["params"])
            variables["params"]["img_align"] = av["params"]
        return variables

    def _split_vars(self, variables):
        params = dict(variables["params"])
        align_params = params.pop("img_align", None)
        model_vars = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
        }
        return model_vars, align_params

    def preprocess(self, images):
        x = (images.astype(jnp.float32) - self.pixel_mean) / self.pixel_std
        return x.astype(self.dtype)

    def _model_fwd(self, variables, images, train):
        model_vars, _ = self._split_vars(variables)
        if train:
            (preds, neck), mut = self.module.apply(
                model_vars, self.preprocess(images), True,
                mutable=["batch_stats"],
            )
            return preds, neck, dict(mut)
        preds, neck = self.module.apply(
            model_vars, self.preprocess(images), False
        )
        return preds, neck, {}

    # ------------------------------------------------------------- training
    def forward_train(self, variables, images, image_sizes, gt, rng,
                      do_align=False, domain_label=1.0):
        preds, neck, mutated = self._model_fwd(variables, images, True)
        targets = build_targets(
            gt.boxes, gt.classes, gt.valid, self.feat_hws, self.anchor_t
        )
        losses = yolo_losses(
            preds, targets, self.num_classes, **self.loss_gains
        )
        if do_align and self.img_da_enabled:
            losses.update(
                self._align_loss(variables, neck, domain_label)
            )
        aux = {
            "head_outputs": preds,
            "std_losses": {k: v for k, v in losses.items()},
            "mutated_vars": mutated,
        }
        return losses, aux

    def _align_loss(self, variables, neck, domain_label):
        _, align_params = self._split_vars(variables)
        layer = {"p3": 0, "p4": 1, "p5": 2}[
            self.cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_LAYER
        ]
        f = grad_reverse(neck[layer])
        preds = self.align_module.apply(
            {"params": align_params}, f
        ).astype(jnp.float32)
        tgt = jnp.full_like(preds, domain_label)
        w = self.cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_WEIGHT
        return {"loss_da_img": w * bce_with_logits(preds, tgt).mean()}

    def forward_domain_align(self, variables, images, image_sizes, rng,
                             domain_label):
        # train-mode pass: BN running stats DO update on the target-weak
        # stream, matching the reference's train-mode target_weak forward
        # (``aldi/trainer.py:108-109``) — the mutated stats are returned for
        # the train step to absorb rather than dropped.
        preds, neck, mutated = self._model_fwd(variables, images, True)
        aux = {"mutated_vars": mutated}
        return self._align_loss(variables, neck, domain_label), aux

    # ------------------------------------------------------------- teacher
    def forward_inference(self, variables, images, image_sizes):
        preds, _, _ = self._model_fwd(variables, images, False)
        return self._inference_from_preds(preds, image_sizes)

    def _inference_from_preds(self, preds, image_sizes):
        boxes, scores, classes, valid = decode_predictions(
            preds, self.num_classes, self.conf_thresh
        )
        from ..ops.boxes import clip_boxes

        boxes = clip_boxes(
            boxes, (image_sizes[:, 0, None], image_sizes[:, 1, None])
        )
        k = min(2000, boxes.shape[1])
        topk = self.cfg.TEST.DETECTIONS_PER_IMAGE

        def per_image(args):
            bx, sc, cl, vl = args
            s = jnp.where(vl, sc, -jnp.inf)
            vals, idx = jax.lax.top_k(s, k)
            bx, cl = bx[idx], cl[idx]
            vl = vl[idx] & jnp.isfinite(vals)
            keep = batched_nms_keep_mask(
                bx, vals, cl, vl, self.iou_thresh
            ) & vl
            fs, order = jax.lax.top_k(jnp.where(keep, vals, -jnp.inf), topk)
            return bx[order], fs, cl[order], jnp.isfinite(fs)

        return jax.lax.map(
            per_image, (boxes, scores, classes, valid)
        )

    def forward_teacher_ctx(self, variables, images, image_sizes, rng,
                            threshold, max_gt):
        from ..engine.pseudolabel import detections_to_pseudo_labels

        preds, _, _ = self._model_fwd(variables, images, False)
        dets = self._inference_from_preds(preds, image_sizes)
        pseudo_gt = detections_to_pseudo_labels(
            *dets, threshold=threshold, max_gt=max_gt
        )
        metrics = {
            "num_pseudo_labels": pseudo_gt.valid.sum()
            / jnp.maximum(images.shape[0], 1)
        }
        return {"head_outputs": preds, "pseudo_gt": pseudo_gt}, pseudo_gt, metrics

    def distill_losses(self, teacher_variables, ctx, s_aux):
        """YoloDistiller soft losses (``aldi/yolo/distill.py:102-151``):
        soft obj = per-level BCE(student obj, sigmoid(teacher obj / T)) x
        balance x obj_gain; soft cls = CE at pseudo-GT-matched cells; soft
        reg = the student's standard box loss on pseudo-GT."""
        cfg = self.cfg
        d = cfg.DOMAIN_ADAPT.DISTILL
        s_preds = s_aux["head_outputs"]
        t_preds = [jax.lax.stop_gradient(p) for p in ctx["head_outputs"]]
        out = {}
        lobj = 0.0
        lcls = 0.0
        if d.ROIH_CLS_ENABLED:
            pg = ctx["pseudo_gt"]
            targets = build_targets(
                pg.boxes, pg.classes, pg.valid, self.feat_hws, self.anchor_t
            )
        for i, (ps_l, pt_l) in enumerate(zip(s_preds, t_preds)):
            if d.OBJ_ENABLED:
                t_probs = jax.nn.sigmoid(pt_l[..., 4] / d.OBJ_TMP)
                lobj += (
                    bce_with_logits(ps_l[..., 4], t_probs).mean()
                    * BALANCE[i]
                )
            if d.ROIH_CLS_ENABLED and self.num_classes > 1:
                t = targets[i]
                b, h, w, na, no = ps_l.shape
                bi = jnp.broadcast_to(
                    jnp.arange(b)[:, None, None, None], t["valid"].shape
                )
                flat = ((bi * h + t["cj"]) * w + t["ci"]).reshape(-1)
                ai = jnp.broadcast_to(
                    jnp.arange(na)[None, None, :, None], t["valid"].shape
                ).reshape(-1)
                ps = ps_l.reshape(-1, na, no)[flat, ai][:, 5:]
                ts = pt_l.reshape(-1, na, no)[flat, ai][:, 5:]
                t_probs = jax.nn.softmax(ts / d.CLS_TMP, axis=-1)
                ce = softmax_cross_entropy(ps, t_probs)
                vf = t["valid"].reshape(-1).astype(jnp.float32)
                lcls += (ce * vf).sum() / jnp.maximum(vf.sum(), 1.0)
        if d.OBJ_ENABLED:
            out["loss_soft_obj"] = lobj * self.loss_gains["obj_gain"]
        if d.ROIH_CLS_ENABLED:
            out["loss_soft_cls"] = lcls * self.loss_gains["cls_gain"]
        if d.ROIH_REG_ENABLED:
            out["loss_soft_reg"] = s_aux["std_losses"]["loss_box"]
        return out
