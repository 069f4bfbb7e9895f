"""Second stage: proposal sampling, box head, Fast R-CNN losses/inference.

Replaces the substrate's ``StandardROIHeads`` + ``FastRCNNConvFCHead`` +
``FastRCNNOutputLayers`` (+ ``box_pooler``) consumed at reference
``configs/detectron2/Base-RCNN-FPN.yaml:21-27`` and hooked by the distiller
(``aldi/distill.py:124,128``; delta layout [N, K, 4] with background last at
``aldi/distill.py:255-263``).

Sampling takes an explicit PRNG key; the DAOD engine passes the SAME sampled
proposals to teacher and student box heads, which supersedes the reference's
ManualSeed/ReplaceProposalsOnce hook pair (``aldi/helpers.py:17-42``) with a
plain function argument.
"""


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops import matcher as matcher_ops
from ..ops.losses import smooth_l1, softmax_cross_entropy
from ..ops.nms import batched_nms_keep_mask
from ..ops.roi_align import roi_align_batched


class FastRCNNConvFCHead(nn.Module):
    """Flattened pooled features -> conv* -> fc* (reference uses 0 conv, 2 fc
    of 1024)."""

    num_fc: int = 2
    fc_dim: int = 1024
    num_conv: int = 0
    conv_dim: int = 256
    norm: str = ""  # "" or "LN" (ViTDet configs)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [N, 7, 7, C]
        init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=self.norm == "",
                        kernel_init=init, dtype=self.dtype, name=f"conv{i + 1}")(x)
            if self.norm == "LN":
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"conv{i + 1}_norm")(x).astype(self.dtype)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, kernel_init=init, dtype=self.dtype,
                         name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    """cls logits [N, K+1] (background last) + per-class deltas [N, K*4]."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="cls_score")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.001),
                       name="bbox_pred")(x)
        return cls, reg


def sample_proposals(
    key,
    proposals: jnp.ndarray,  # [B, N, 4]
    prop_valid: jnp.ndarray,  # [B, N]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_classes: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G]
    num_classes: int,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    iou_threshold: float = 0.5,
    append_gt: bool = True,
):
    """Substrate ``label_and_sample_proposals``: match candidates (proposals
    [+ gt]) to gt, assign classes (bg = num_classes), sample a fixed-size
    balanced set.

    Returns dict with boxes [B, S, 4], classes [B, S], reg target boxes
    [B, S, 4], valid [B, S], is_pos [B, S].
    """
    if append_gt:
        proposals = jnp.concatenate([proposals, gt_boxes], axis=1)
        prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=1)

    def per_image(k, props, pv, gtb, gtc, gtv):
        iou = box_ops.pairwise_iou(props, gtb)
        midx, mlab = matcher_ops.match(iou, gtv, [iou_threshold], [0, 1], False)
        classes = jnp.where(mlab == 1, gtc[midx], num_classes)
        # invalid candidates -> ignore label so they are never sampled
        classes_for_sampling = jnp.where(pv, classes, -1)
        # independent keys: correlated draws between the label subsample
        # and the index fill would skew the sampled-set distribution the
        # distillation path depends on
        k_sub, k_idx = jax.random.split(k)
        pos, neg = matcher_ops.subsample_labels(
            k_sub, classes_for_sampling, batch_size_per_image,
            positive_fraction, bg_label=num_classes,
        )
        idx, valid, is_pos = matcher_ops.sample_fixed_indices(
            k_idx, pos, neg, batch_size_per_image
        )
        return {
            "boxes": props[idx],
            "classes": jnp.where(valid, classes[idx], num_classes),
            "target_boxes": gtb[midx][idx],
            "valid": valid,
            "is_pos": is_pos,
        }

    keys = jax.random.split(key, proposals.shape[0])
    return jax.vmap(per_image)(
        keys, proposals, prop_valid, gt_boxes, gt_classes, gt_valid
    )


def box_pooler(features, boxes, valid, strides, resolution=7,
               mode="corner_gather"):
    """Multi-level ROIAlign -> [B, S, res, res, C].

    Modes (see ops/roi_align.py): "corner_gather" is the autodiff-safe
    XLA baseline; "pallas"/"pallas_fused" route the forward through the
    chunked-DMA Pallas kernel (fused pairs it with the corner-scatter
    backward); "slice2x2"/"fused" are the lax.gather A/B variants
    (measured slower on v5e)."""
    return roi_align_batched(features, boxes, valid, strides, resolution,
                             mode=mode)


def fast_rcnn_losses(
    cls_logits: jnp.ndarray,  # [B, S, K+1]
    deltas: jnp.ndarray,  # [B, S, K*4]
    sampled: dict,
    num_classes: int,
    box_reg_weights=(10.0, 10.0, 5.0, 5.0),
    smooth_l1_beta: float = 0.0,
) -> dict:
    """Substrate ``FastRCNNOutputLayers.losses``: softmax CE averaged over
    sampled proposals; smooth-L1 on the gt-class deltas of foreground
    proposals, normalized by the total number of sampled proposals."""
    valid = sampled["valid"]
    classes = sampled["classes"]
    n_valid = jnp.maximum(valid.sum(), 1)

    ce = softmax_cross_entropy(cls_logits.astype(jnp.float32), classes)
    loss_cls = (ce * valid).sum() / n_valid

    fg = valid & (classes < num_classes)
    target = box_ops.encode_deltas(
        sampled["boxes"], sampled["target_boxes"], box_reg_weights
    )
    d = deltas.reshape(deltas.shape[:-1] + (num_classes, 4)).astype(jnp.float32)
    cls_idx = jnp.clip(classes, 0, num_classes - 1)
    d_fg = jnp.take_along_axis(d, cls_idx[..., None, None], axis=-2).squeeze(-2)
    reg = smooth_l1(d_fg, target, smooth_l1_beta).sum(-1)
    loss_reg = (reg * fg).sum() / n_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_reg}


def fast_rcnn_inference(
    proposals: jnp.ndarray,  # [B, N, 4]
    prop_valid: jnp.ndarray,  # [B, N]
    cls_logits: jnp.ndarray,  # [B, N, K+1]
    deltas: jnp.ndarray,  # [B, N, K*4]
    image_sizes: jnp.ndarray,  # [B, 2]
    num_classes: int,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    topk_per_image: int = 100,
    box_reg_weights=(10.0, 10.0, 5.0, 5.0),
    nms_candidates: int = 2000,
):
    """Substrate ``fast_rcnn_inference``: per-class decode, score threshold,
    class-aware NMS, top-k. Returns (boxes [B, D, 4], scores [B, D],
    classes [B, D], valid [B, D]).

    ``nms_candidates`` caps the (box, class) pairs entering NMS by score —
    a static-shape prefilter; with topk_per_image=100 the tail never
    survives.
    """
    b, n, _ = proposals.shape
    scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., :-1]
    pred = box_ops.decode_deltas(
        deltas.astype(jnp.float32),
        proposals,
        box_reg_weights,
    ).reshape(b, n, num_classes, 4)
    pred = box_ops.clip_boxes(
        pred, (image_sizes[:, 0, None, None], image_sizes[:, 1, None, None])
    )

    flat_boxes = pred.reshape(b, n * num_classes, 4)
    flat_scores = scores.reshape(b, n * num_classes)
    flat_cls = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[None, None, :], (b, n, num_classes)
    ).reshape(b, n * num_classes)
    flat_valid = (
        (flat_scores > score_thresh)
        & jnp.repeat(prop_valid, num_classes, axis=1)
        & box_ops.nonempty(flat_boxes)
    )

    k = min(nms_candidates, n * num_classes)

    def per_image(args):
        bx, sc, cl, vl = args
        s = jnp.where(vl, sc, -jnp.inf)
        vals, idx = jax.lax.top_k(s, k)
        bx, cl, vl = bx[idx], cl[idx], vl[idx] & jnp.isfinite(vals)
        keep = batched_nms_keep_mask(bx, vals, cl, vl, nms_thresh) & vl
        final_scores, order = jax.lax.top_k(
            jnp.where(keep, vals, -jnp.inf), topk_per_image
        )
        return bx[order], final_scores, cl[order], jnp.isfinite(final_scores)

    return jax.lax.map(per_image, (flat_boxes, flat_scores, flat_cls, flat_valid))
