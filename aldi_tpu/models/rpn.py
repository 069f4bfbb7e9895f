"""Region Proposal Network: head module + functional proposal/loss math.

Replaces the substrate RPN consumed throughout the reference
(``proposal_generator``/``rpn_head``/``anchor_generator``, e.g.
``aldi/distill.py:122-129``; behavior spec in SURVEY.md section 2.2). The head is a
Flax module; anchor labeling, proposal selection, and losses are pure
functions over padded arrays so the distiller can re-run them exactly
(reference ``aldi/distill.py:198-204`` re-runs ``label_and_sample_anchors``).

Flattened (H, W, A) ordering matches anchors.py, so logits/deltas/anchors
align index-for-index across teacher and student.
"""

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops.dispatch import target_backend
from ..ops import matcher as matcher_ops
from ..ops.losses import bce_with_logits, smooth_l1
from ..ops.nms import nms_keep_mask, top_k_by_score


class StandardRPNHead(nn.Module):
    """3x3 conv stack + 1x1 objectness / 1x1 anchor-delta heads, shared
    across levels. conv_dims follows the substrate's MODEL.RPN.CONV_DIMS
    (-1 = input channels; ViTDet configs use two convs). Returns per-level
    ([B, HWA], [B, HWA, 4])."""

    num_anchors: int
    conv_dim: int = 256
    conv_dims: tuple = (-1,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        init = nn.initializers.normal(0.01)
        convs = []
        for i, d in enumerate(self.conv_dims):
            dim = self.conv_dim if d == -1 else d
            name = "conv" if len(self.conv_dims) == 1 else f"conv{i}"
            convs.append(
                nn.Conv(dim, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=init, dtype=self.dtype, name=name)
            )
        obj = nn.Conv(self.num_anchors, (1, 1), kernel_init=init,
                      dtype=self.dtype, name="objectness_logits")
        dlt = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=init,
                      dtype=self.dtype, name="anchor_deltas")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in convs:
                t = nn.relu(conv(t))
            b = f.shape[0]
            logits.append(obj(t).reshape(b, -1))  # (H, W, A) row-major
            deltas.append(dlt(t).reshape(b, -1, 4))
        return logits, deltas


def label_anchors(
    key,
    anchors: jnp.ndarray,  # [R, 4] all levels concatenated
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_valid: jnp.ndarray,  # [B, G]
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    thresholds=(0.3, 0.7),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Substrate ``label_and_sample_anchors``: returns per-anchor labels
    [B, R] in {-1 ignore, 0 neg, 1 pos} *after* subsampling, and matched gt
    boxes [B, R, 4]."""

    # the Pallas matcher streams anchors through VMEM instead of
    # materializing the [765k, M] IoU matrix; batch is a static python loop
    # so the kernel is not vmapped
    use_pallas = (
        target_backend() == "tpu" and gt_boxes.shape[1] <= 128
        and anchors.shape[0] >= 4096
    )

    def per_image(k, gtb, gtv):
        if use_pallas:
            from ..ops.pallas_match import match_boxes_pallas

            midx, mlab = match_boxes_pallas(
                anchors, gtb, gtv, list(thresholds), [0, -1, 1],
                allow_low_quality=True,
            )
        else:
            iou = box_ops.pairwise_iou(anchors, gtb)
            midx, mlab = matcher_ops.match(
                iou, gtv, list(thresholds), [0, -1, 1],
                allow_low_quality=True,
            )
        pos, neg = matcher_ops.subsample_labels(
            k, mlab.astype(jnp.int32), batch_size_per_image, positive_fraction,
            bg_label=0,
        )
        lab = jnp.full(mlab.shape, -1, jnp.int8)
        lab = jnp.where(neg, jnp.int8(0), lab)
        lab = jnp.where(pos, jnp.int8(1), lab)
        return lab, gtb[midx]

    keys = jax.random.split(key, gt_boxes.shape[0])
    if use_pallas:
        outs = [
            per_image(keys[b], gt_boxes[b], gt_valid[b])
            for b in range(gt_boxes.shape[0])
        ]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))
    return jax.vmap(per_image)(keys, gt_boxes, gt_valid)


def rpn_losses_dense(
    key,
    anchors: jnp.ndarray,  # [R, 4]
    logits: jnp.ndarray,  # [B, R]
    deltas: jnp.ndarray,  # [B, R, 4]
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
    smooth_l1_beta: float = 0.0,
) -> dict:
    """Dense masked-reduction formulation of the RPN losses (same math as
    rpn_losses; kept selectable via TPU.RPN_LOSS_IMPL for perf A/B — the
    dense [B, R(, 4)] loss chains are what the sampled form eliminates)."""
    labels, matched_gt = label_anchors(
        key, anchors, gt_boxes, gt_valid, batch_size_per_image,
        positive_fraction,
    )
    b = logits.shape[0]
    normalizer = b * batch_size_per_image
    valid = labels >= 0
    pos = labels == 1

    obj = bce_with_logits(logits.astype(jnp.float32), pos.astype(jnp.float32))
    loss_cls = (obj * valid).sum() / normalizer

    target = box_ops.encode_deltas(
        jnp.broadcast_to(anchors, matched_gt.shape), matched_gt,
        box_reg_weights,
    )
    reg = smooth_l1(deltas.astype(jnp.float32), target, smooth_l1_beta).sum(-1)
    loss_loc = (reg * pos).sum() / normalizer
    return {"loss_rpn_cls": loss_cls, "loss_rpn_loc": loss_loc}


def label_anchors_sampled(
    key,
    anchors: jnp.ndarray,  # [R, 4]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_valid: jnp.ndarray,  # [B, G]
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    thresholds=(0.3, 0.7),
):
    """label_anchors + conversion of the sampled pos/neg masks to exactly
    ``batch_size_per_image`` indices per image.

    Returns (idx [B, K], valid [B, K], is_pos [B, K], matched_gt [B, K, 4]):
    the loss then runs on the K sampled anchors only instead of masked
    reductions over all ~765k — the dense [B, R(, 4)] loss/label tensors and
    their backward never materialize (same math: the fixed normalizer is
    batch_size_per_image, substrate semantics).
    """
    use_pallas = (
        target_backend() == "tpu" and gt_boxes.shape[1] <= 128
        and anchors.shape[0] >= 4096
    )
    k = min(batch_size_per_image, anchors.shape[0])

    def per_image(ks, gtb, gtv):
        k_sub, k_fix = jax.random.split(ks)
        if use_pallas:
            from ..ops.pallas_match import match_boxes_pallas

            midx, mlab = match_boxes_pallas(
                anchors, gtb, gtv, list(thresholds), [0, -1, 1],
                allow_low_quality=True,
            )
        else:
            iou = box_ops.pairwise_iou(anchors, gtb)
            midx, mlab = matcher_ops.match(
                iou, gtv, list(thresholds), [0, -1, 1],
                allow_low_quality=True,
            )
        idx, valid, is_pos = matcher_ops.subsample_indices(
            jax.random.fold_in(k_sub, 0), mlab.astype(jnp.int32), k,
            positive_fraction, bg_label=0,
        )
        del k_fix  # kept in the split for PRNG-stream stability
        return idx, valid, is_pos, gtb[midx[idx]]

    keys = jax.random.split(key, gt_boxes.shape[0])
    if use_pallas:  # batch as a static loop: the kernel is not vmapped
        outs = [
            per_image(keys[b], gt_boxes[b], gt_valid[b])
            for b in range(gt_boxes.shape[0])
        ]
        return tuple(jnp.stack([o[i] for o in outs]) for i in range(4))
    return jax.vmap(per_image)(keys, gt_boxes, gt_valid)


def rpn_losses(
    key,
    anchors: jnp.ndarray,  # [R, 4]
    logits: jnp.ndarray,  # [B, R]
    deltas: jnp.ndarray,  # [B, R, 4]
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
    smooth_l1_beta: float = 0.0,
) -> dict:
    """Substrate RPN losses: objectness BCE over sampled anchors and
    smooth-L1 anchor-delta regression over positives, each normalized by
    B * batch_size_per_image. Computed on the K sampled anchors only (the
    backward is a K-row scatter into the head outputs, not a dense [B, R]
    elementwise chain)."""
    idx, valid, is_pos, matched_gt = label_anchors_sampled(
        key, anchors, gt_boxes, gt_valid, batch_size_per_image,
        positive_fraction,
    )
    b = logits.shape[0]
    normalizer = b * batch_size_per_image

    lg = jnp.take_along_axis(logits, idx, axis=1).astype(jnp.float32)
    obj = bce_with_logits(lg, is_pos.astype(jnp.float32))
    loss_cls = (obj * valid).sum() / normalizer

    dl = jnp.take_along_axis(
        deltas, idx[..., None], axis=1
    ).astype(jnp.float32)  # [B, K, 4]
    target = box_ops.encode_deltas(anchors[idx], matched_gt, box_reg_weights)
    reg = smooth_l1(dl, target, smooth_l1_beta).sum(-1)
    loss_loc = (reg * is_pos).sum() / normalizer
    return {"loss_rpn_cls": loss_cls, "loss_rpn_loc": loss_loc}


def generate_proposals(
    logits: List[jnp.ndarray],  # per level [B, HWA_l]
    deltas: List[jnp.ndarray],  # per level [B, HWA_l, 4]
    anchors: List[jnp.ndarray],  # per level [HWA_l, 4]
    image_sizes: jnp.ndarray,  # [B, 2] (h, w)
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    box_reg_weights=(1.0, 1.0, 1.0, 1.0),
):
    """Substrate ``find_top_rpn_proposals``: per-level top-k by objectness,
    decode + clip + per-level NMS, then global top-k. Fully static shapes;
    returns (boxes [B, K, 4], scores [B, K], valid [B, K])."""
    b = logits[0].shape[0]
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    for lg, dl, an in zip(logits, deltas, anchors):
        k = min(pre_nms_topk, lg.shape[1])
        s, idx = jax.lax.top_k(lg.astype(jnp.float32), k)  # [B, k]
        d = jnp.take_along_axis(dl, idx[..., None], axis=1)
        a = an[idx]  # [B, k, 4]
        bx = box_ops.decode_deltas(d.astype(jnp.float32), a, box_reg_weights)
        bx = box_ops.clip_boxes(
            bx, (image_sizes[:, 0, None], image_sizes[:, 1, None])
        )
        v = box_ops.nonempty(bx, min_size) & jnp.isfinite(s)
        # pad level to pre_nms_topk so levels stack uniformly
        if k < pre_nms_topk:
            pad = pre_nms_topk - k
            bx = jnp.pad(bx, ((0, 0), (0, pad), (0, 0)))
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            v = jnp.pad(v, ((0, 0), (0, pad)))
        lvl_boxes.append(bx)
        lvl_scores.append(s)
        lvl_valid.append(v)

    boxes_l = jnp.stack(lvl_boxes, 1)  # [B, L, K, 4]
    scores_l = jnp.stack(lvl_scores, 1)
    valid_l = jnp.stack(lvl_valid, 1)

    # per-(image, level) NMS; lax.map over images bounds the IoU-matrix memory
    def nms_image(args):
        bx, sc, vl = args  # [L, K, ...]
        return jax.vmap(lambda bb, ss, vv: nms_keep_mask(bb, ss, vv, nms_thresh))(
            bx, sc, vl
        )

    keep = jax.lax.map(nms_image, (boxes_l, scores_l, valid_l))  # [B, L, K]

    flat_boxes = boxes_l.reshape(b, -1, 4)
    flat_scores = jnp.where(keep, scores_l, -jnp.inf).reshape(b, -1)
    flat_valid = (keep & valid_l).reshape(b, -1)
    return jax.vmap(lambda bb, ss, vv: top_k_by_score(bb, ss, vv, post_nms_topk))(
        flat_boxes, flat_scores, flat_valid
    )
