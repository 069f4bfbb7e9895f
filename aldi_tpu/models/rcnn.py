"""GeneralizedRCNN meta-architecture: Flax module + functional orchestrator.

Replaces the substrate ``GeneralizedRCNN`` that the reference composes its DA
mixins onto (``aldi/model.py:12-31``, ``aldi/align.py:17-101``). Where the
reference reaches into the module with forward hooks (``SaveIO``) and
pre-forward proposal swaps (``ReplaceProposalsOnce``), this design returns
every intermediate the DAOD engine needs as an explicit ``aux`` pytree and
accepts teacher-side proposal overrides as a plain argument.

The nn.Module holds parameters only; proposal generation, sampling, losses,
and inference are pure functions (rpn.py / roi_heads.py) driven by
``RCNNDetector``, which owns all static/config state (anchors for the fixed
canvas, thresholds, top-k sizes).
"""

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import compute_dtype, resolve_canvas
from ..ops.anchors import AnchorGenerator
from ..ops.losses import bce_with_logits
from .fpn import FPN
from .resnet import ResNet
from .roi_heads import (
    FastRCNNConvFCHead,
    FastRCNNOutputLayers,
    box_pooler,
    fast_rcnn_inference,
    fast_rcnn_losses,
    sample_proposals,
)
from .rpn import (
    StandardRPNHead,
    generate_proposals,
    label_anchors_sampled,
    rpn_losses,
    rpn_losses_dense,
)


@jax.custom_vjp
def grad_reverse(x):
    """Gradient reversal layer (GRL), weight -1 — reference
    ``aldi/helpers.py:51-63``."""
    return x


def _gr_fwd(x):
    return x, None


def _gr_bwd(_, g):
    return (jax.tree_util.tree_map(lambda t: -t, g),)


grad_reverse.defvjp(_gr_fwd, _gr_bwd)


class ConvDiscriminator(nn.Module):
    """conv3x3 -> relu (xN) -> global avg pool -> linear(1); reference
    ``aldi/align.py:103-119``."""

    hidden_dims: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        for i, d in enumerate(self.hidden_dims):
            x = nn.Conv(d, (3, 3), padding="VALID", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(1, dtype=self.dtype, name="linear")(x)  # [B, 1]


class FCDiscriminator(nn.Module):
    """flatten -> (linear -> relu)xN -> linear(1); reference
    ``aldi/align.py:121-136``."""

    hidden_dims: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [..., D]
        x = x.reshape(x.shape[0], -1) if x.ndim > 2 else x
        for i, d in enumerate(self.hidden_dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"linear{i}")(x)
            x = nn.relu(x)
        return nn.Dense(1, dtype=self.dtype, name="linear_out")(x)


class RCNN(nn.Module):
    """Parameter container with per-stage apply methods.

    ``backbone_name`` selects the bottom-up net, keyed by the same registry
    names the reference uses in YAML (``MODEL.BACKBONE.NAME``):
    build_resnet_fpn_backbone, build_vitdet_b/l_backbone,
    build_convnext_fpn_backbone. All produce the same p2..p6 contract.
    """

    num_classes: int
    num_cell_anchors: int
    backbone_name: str = "build_resnet_fpn_backbone"
    depth: int = 50
    freeze_at: int = 2
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    convnext_depths: Sequence[int] = (3, 3, 9, 3)
    convnext_dims: Sequence[int] = (96, 192, 384, 768)
    convnext_drop_path: float = 0.2
    convnext_layer_scale: float = 1e-6
    use_act_checkpoint: bool = True
    fpn_out_channels: int = 256
    rpn_conv_dims: Sequence[int] = (-1,)
    num_fc: int = 2
    fc_dim: int = 1024
    num_conv: int = 0
    box_head_norm: str = ""
    img_da_enabled: bool = False
    img_da_hidden_dims: Sequence[int] = (256,)
    ins_da_enabled: bool = False
    ins_da_hidden_dims: Sequence[int] = (1024,)
    pooler_resolution: int = 7
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        name = self.backbone_name
        if name == "build_resnet_fpn_backbone":
            self.bottom_up = ResNet(
                depth=self.depth, freeze_at=self.freeze_at,
                stride_in_1x1=self.stride_in_1x1,
                res5_dilation=self.res5_dilation, dtype=self.dtype,
                name="backbone",
            )
            self.fpn = FPN(out_channels=self.fpn_out_channels, dtype=self.dtype)
        elif name in ("build_vitdet_b_backbone", "build_vitdet_l_backbone"):
            from .vit import VIT_CONFIGS, SimpleFeaturePyramid, ViT

            size = name.split("_")[2]
            self.net = ViT(
                **VIT_CONFIGS[size],
                use_act_checkpoint=self.use_act_checkpoint,
                dtype=self.dtype, name="backbone",
            )
            self.sfp = SimpleFeaturePyramid(
                out_channels=self.fpn_out_channels, dtype=self.dtype
            )
        elif name == "build_convnext_fpn_backbone":
            from .convnext import ConvNeXt

            self.bottom_up = ConvNeXt(
                depths=tuple(self.convnext_depths),
                dims=tuple(self.convnext_dims),
                drop_path_rate=self.convnext_drop_path,
                layer_scale_init=self.convnext_layer_scale,
                dtype=self.dtype, name="backbone",
            )
            self.fpn = FPN(out_channels=self.fpn_out_channels, dtype=self.dtype)
        else:
            raise ValueError(f"Unknown backbone {name}")
        self.rpn_head = StandardRPNHead(
            num_anchors=self.num_cell_anchors, conv_dim=self.fpn_out_channels,
            conv_dims=tuple(self.rpn_conv_dims), dtype=self.dtype,
        )
        self.box_head = FastRCNNConvFCHead(
            num_fc=self.num_fc, fc_dim=self.fc_dim, num_conv=self.num_conv,
            norm=self.box_head_norm, dtype=self.dtype,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype
        )
        if self.img_da_enabled:
            self.img_align = ConvDiscriminator(
                hidden_dims=self.img_da_hidden_dims, dtype=self.dtype
            )
        if self.ins_da_enabled:
            self.ins_align = FCDiscriminator(
                hidden_dims=self.ins_da_hidden_dims, dtype=self.dtype
            )

    def backbone_fwd(self, images, train: bool = False):
        """images (normalized, NHWC) -> ordered FPN feature list p2..p6."""
        if self.backbone_name.startswith("build_vitdet"):
            feats = self.sfp(self.net(images, train))
        elif self.backbone_name == "build_convnext_fpn_backbone":
            feats = self.fpn(self.bottom_up(images, train))
        else:
            feats = self.fpn(self.bottom_up(images))
        return [feats[k] for k in sorted(feats.keys())]

    def rpn_fwd(self, features):
        return self.rpn_head(features)

    def box_fwd(self, pooled):
        """pooled [B, S, r, r, C] -> (cls_logits [B,S,K+1], deltas [B,S,K*4],
        box_features [B,S,fc_dim])."""
        b, s = pooled.shape[:2]
        x = self.box_head(pooled.reshape((b * s,) + pooled.shape[2:]))
        cls, reg = self.box_predictor(x)
        return (
            cls.reshape(b, s, -1),
            reg.reshape(b, s, -1),
            x.reshape(b, s, -1),
        )

    def img_align_fwd(self, feat):
        return self.img_align(feat)

    def ins_align_fwd(self, box_features):
        b, s = box_features.shape[:2]
        out = self.ins_align(box_features.reshape(b * s, -1))
        return out.reshape(b, s)

    def __call__(self, images):
        """Init path: touch every submodule once."""
        feats = self.backbone_fwd(images)
        logits, deltas = self.rpn_fwd(feats)
        b = images.shape[0]
        dummy = jnp.tile(
            jnp.asarray([[0.0, 0.0, 32.0, 32.0]], images.dtype), (b, 4, 1)
        )
        pooled = box_pooler(
            feats[:-1], dummy, jnp.ones((b, 4), bool),
            self.pyramid_strides()[:-1], self.pooler_resolution,
        )
        cls, reg, boxf = self.box_fwd(pooled)
        extras = []
        if self.img_da_enabled:
            extras.append(self.img_align_fwd(feats[0]))
        if self.ins_da_enabled:
            extras.append(self.ins_align_fwd(boxf))
        return cls, reg

    @staticmethod
    def pyramid_strides():
        return [4, 8, 16, 32, 64]


def _check_res5_dilation(cfg):
    """RES5_DILATION is a C4/DC5-era knob: under an FPN it would leave res5
    at stride 16 while pyramid_strides()/anchors/top-down 2x upsampling all
    assume stride 32 — reject loudly instead of crashing at trace time (the
    reference's shipped configs are all FPN at dilation 1 too)."""
    d = cfg.MODEL.RESNETS.RES5_DILATION
    if d != 1:
        raise NotImplementedError(
            f"MODEL.RESNETS.RES5_DILATION={d}: DC5 is not supported under "
            "the FPN R-CNN family (the DETR family supports DC5 via "
            "MODEL.DEFORMABLE_DETR.DILATION)")
    return d


class RCNNDetector:
    """Static config + pure-function orchestration around the RCNN module.

    The reference equivalent is the glue inside GeneralizedRCNN.forward plus
    the trainer's hook machinery; here every step is an explicit function of
    (variables, batch, rng).
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.dtype = compute_dtype(cfg)
        self.canvas = resolve_canvas(cfg)
        self.num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        self.strides = RCNN.pyramid_strides()
        self.rpn_strides = self.strides  # RPN runs on p2..p6
        self.roi_strides = self.strides[:-1]  # ROI pooling on p2..p5

        self.anchor_gen = AnchorGenerator.from_config(cfg, self.rpn_strides)
        feat_hws = [
            (math.ceil(self.canvas[0] / s), math.ceil(self.canvas[1] / s))
            for s in self.rpn_strides
        ]
        self.anchors = [jnp.asarray(a) for a in self.anchor_gen(feat_hws)]
        self.anchors_cat = jnp.concatenate(self.anchors, axis=0)

        self.pixel_mean = jnp.asarray(cfg.MODEL.PIXEL_MEAN, jnp.float32)
        self.pixel_std = jnp.asarray(cfg.MODEL.PIXEL_STD, jnp.float32)

        self.module = RCNN(
            num_classes=self.num_classes,
            num_cell_anchors=self.anchor_gen.num_cell_anchors,
            backbone_name=cfg.MODEL.BACKBONE.NAME,
            depth=cfg.MODEL.RESNETS.DEPTH,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            res5_dilation=_check_res5_dilation(cfg),
            convnext_depths=tuple(cfg.MODEL.CONVNEXT.DEPTHS),
            convnext_dims=tuple(cfg.MODEL.CONVNEXT.DIMS),
            convnext_drop_path=cfg.MODEL.CONVNEXT.DROP_PATH_RATE,
            convnext_layer_scale=cfg.MODEL.CONVNEXT.LAYER_SCALE_INIT_VALUE,
            use_act_checkpoint=cfg.VIT.USE_ACT_CHECKPOINT,
            fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            rpn_conv_dims=tuple(cfg.MODEL.RPN.CONV_DIMS),
            num_fc=cfg.MODEL.ROI_BOX_HEAD.NUM_FC,
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            num_conv=cfg.MODEL.ROI_BOX_HEAD.NUM_CONV,
            box_head_norm=cfg.MODEL.ROI_BOX_HEAD.NORM,
            img_da_enabled=cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_ENABLED,
            img_da_hidden_dims=tuple(cfg.DOMAIN_ADAPT.ALIGN.IMG_DA_HIDDEN_DIMS),
            ins_da_enabled=cfg.DOMAIN_ADAPT.ALIGN.INS_DA_ENABLED,
            ins_da_hidden_dims=tuple(cfg.DOMAIN_ADAPT.ALIGN.INS_DA_HIDDEN_DIMS),
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            dtype=self.dtype,
        )

        rpn_cfg = cfg.MODEL.RPN
        self.rpn_params = dict(
            batch_size_per_image=rpn_cfg.BATCH_SIZE_PER_IMAGE,
            positive_fraction=rpn_cfg.POSITIVE_FRACTION,
            box_reg_weights=tuple(rpn_cfg.BBOX_REG_WEIGHTS),
            smooth_l1_beta=rpn_cfg.SMOOTH_L1_BETA,
        )
        roi_cfg = cfg.MODEL.ROI_HEADS
        self.roi_sample_params = dict(
            num_classes=self.num_classes,
            batch_size_per_image=roi_cfg.BATCH_SIZE_PER_IMAGE,
            positive_fraction=roi_cfg.POSITIVE_FRACTION,
            iou_threshold=roi_cfg.IOU_THRESHOLDS[0],
            append_gt=roi_cfg.PROPOSAL_APPEND_GT,
        )
        self.box_reg_weights = tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS)
        self.pooler_resolution = cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION

    # ---------------------------------------------------------------- init
    def init_variables(self, rng, batch_size: int = 1):
        images = jnp.zeros(
            (batch_size, self.canvas[0], self.canvas[1], 3), self.dtype
        )
        # jit the init: flax's un-jitted init dispatches op-by-op — minutes
        # of pure RPC latency through a remote-device tunnel at this canvas
        return jax.jit(self.module.init)(rng, images)

    # ---------------------------------------------------------- preprocess
    def preprocess(self, images):
        """float [B, H, W, 3] in 0..255 (cfg INPUT.FORMAT channel order) ->
        normalized compute-dtype tensor."""
        x = (images.astype(jnp.float32) - self.pixel_mean) / self.pixel_std
        return x.astype(self.dtype)

    # -------------------------------------------------------------- stages
    def backbone(self, variables, images, train: bool = False, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.module.apply(
            variables, images, train, method=RCNN.backbone_fwd, rngs=rngs
        )

    def rpn_head(self, variables, features):
        return self.module.apply(variables, features, method=RCNN.rpn_fwd)

    def proposals(self, logits, deltas, image_sizes, train: bool):
        c = self.cfg.MODEL.RPN
        return generate_proposals(
            logits, deltas, self.anchors, image_sizes,
            pre_nms_topk=c.PRE_NMS_TOPK_TRAIN if train else c.PRE_NMS_TOPK_TEST,
            post_nms_topk=(
                c.POST_NMS_TOPK_TRAIN if train else c.POST_NMS_TOPK_TEST
            ),
            nms_thresh=c.NMS_THRESH,
            min_size=self.cfg.MODEL.PROPOSAL_GENERATOR.MIN_SIZE,
            box_reg_weights=self.rpn_params["box_reg_weights"],
        )

    def box_head(self, variables, features, boxes, valid,
                 pool_mode: str = None):
        pooled = box_pooler(
            features[:-1], boxes, valid, self.roi_strides,
            self.pooler_resolution,
            mode=pool_mode or self.cfg.TPU.POOL_MODE,
        )
        return self.module.apply(variables, pooled, method=RCNN.box_fwd)

    # ---------------------------------------------------------- train pass
    def forward_train(
        self,
        variables,
        images,
        image_sizes,
        gt,
        rng,
        do_align: bool = False,
        domain_label: float = 1.0,
        proposals_override: Optional[dict] = None,
        loss_scale_override: Optional[dict] = None,
        precomputed: Optional[dict] = None,
    ):
        """Full training forward. Returns (losses, aux).

        aux carries everything the DAOD engine needs: raw RPN head outputs
        (concatenated over levels in anchor order), the sampled ROI set, and
        box-predictor outputs on it — the reference obtains these via SaveIO
        hooks (``aldi/distill.py:115-138``).

        ``proposals_override``: a ``sampled`` dict from another model's
        forward (the teacher-on-student-proposals path,
        ``aldi/helpers.py:28-42``); skips RPN proposal generation + sampling.

        ``precomputed``: ``{"boxes" [B,K,4], "valid" [B,K]}`` externally
        supplied region proposals (``MODEL.LOAD_PROPOSALS`` — the
        substrate's ``PrecomputedProposals`` generator, inherited by the
        reference through D2's mapper ``proposal_topk`` hook,
        ``/root/reference/aldi/dropin.py:202-208``). Fast-R-CNN semantics:
        the RPN head does not run and contributes no losses.
        """
        k_rpn, k_roi, k_drop = jax.random.split(rng, 3)
        x = self.preprocess(images)
        feats = self.backbone(variables, x, train=True, rng=k_drop)

        losses = {}
        if precomputed is not None:
            assert proposals_override is None
            sampled = sample_proposals(
                k_roi, precomputed["boxes"], precomputed["valid"],
                gt.boxes, gt.classes, gt.valid, **self.roi_sample_params,
            )
            cls_logits, box_deltas, box_feats = self.box_head(
                variables, feats, sampled["boxes"], sampled["valid"]
            )
            losses.update(
                fast_rcnn_losses(
                    cls_logits, box_deltas, sampled, self.num_classes,
                    self.box_reg_weights,
                    self.cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
                )
            )
            if do_align:
                losses.update(
                    self._align_losses(
                        variables, feats, box_feats, domain_label
                    )
                )
            aux = {
                "sampled": sampled,
                "roih_cls_logits": cls_logits.astype(jnp.float32),
                "roih_deltas": box_deltas.astype(jnp.float32),
            }
            return losses, aux

        logits, deltas = self.rpn_head(variables, feats)
        logits_cat = jnp.concatenate(
            [l.astype(jnp.float32) for l in logits], axis=1
        )
        deltas_cat = jnp.concatenate(
            [d.astype(jnp.float32) for d in deltas], axis=1
        )

        rpn_loss_fn = (
            rpn_losses if self.cfg.TPU.RPN_LOSS_IMPL == "sampled"
            else rpn_losses_dense
        )
        losses.update(
            rpn_loss_fn(
                k_rpn, self.anchors_cat, logits_cat, deltas_cat,
                gt.boxes, gt.valid, **self.rpn_params,
            )
        )

        if proposals_override is None:
            pboxes, pscores, pvalid = self.proposals(
                logits, deltas, image_sizes, train=True
            )
            # proposals are constants to the ROI stage (substrate detaches
            # proposal boxes); without this, gradients flow back through
            # ROIAlign coordinates -> box decode -> NMS/top-k — wrong
            # semantics and an expensive scatter-heavy backward
            pboxes = jax.lax.stop_gradient(pboxes)
            sampled = sample_proposals(
                k_roi, pboxes, pvalid, gt.boxes, gt.classes, gt.valid,
                **self.roi_sample_params,
            )
        else:
            sampled = proposals_override

        cls_logits, box_deltas, box_feats = self.box_head(
            variables, feats, sampled["boxes"], sampled["valid"]
        )
        losses.update(
            fast_rcnn_losses(
                cls_logits, box_deltas, sampled, self.num_classes,
                self.box_reg_weights,
                self.cfg.MODEL.ROI_BOX_HEAD.SMOOTH_L1_BETA,
            )
        )

        if do_align:
            losses.update(
                self._align_losses(variables, feats, box_feats, domain_label)
            )

        aux = {
            "rpn_logits": logits_cat,
            "rpn_deltas": deltas_cat,
            "sampled": sampled,
            "roih_cls_logits": cls_logits.astype(jnp.float32),
            "roih_deltas": box_deltas.astype(jnp.float32),
        }
        return losses, aux

    def _align_losses(self, variables, feats, box_feats, domain_label):
        out = {}
        cfg_a = self.cfg.DOMAIN_ADAPT.ALIGN
        layer_idx = {"p2": 0, "p3": 1, "p4": 2, "p5": 3, "p6": 4}[
            cfg_a.IMG_DA_LAYER
        ]
        if cfg_a.IMG_DA_ENABLED:
            f = grad_reverse(feats[layer_idx])
            preds = self.module.apply(
                variables, f, method=RCNN.img_align_fwd
            ).astype(jnp.float32)
            tgt = jnp.full_like(preds, domain_label)
            out["loss_da_img"] = (
                cfg_a.IMG_DA_WEIGHT * bce_with_logits(preds, tgt).mean()
            )
        if cfg_a.INS_DA_ENABLED:
            f = grad_reverse(box_feats)
            preds = self.module.apply(
                variables, f, method=RCNN.ins_align_fwd
            ).astype(jnp.float32)
            tgt = jnp.full_like(preds, domain_label)
            out["loss_da_ins"] = (
                cfg_a.INS_DA_WEIGHT * bce_with_logits(preds, tgt).mean()
            )
        return out

    # ------------------------------------------------ DAOD engine interface
    # The jitted train step (engine/train_step.py) drives every detector
    # family through four methods: forward_train, forward_teacher_ctx,
    # distill_losses, forward_inference. This replaces the reference's
    # per-family distiller classes + hook wiring (DISTILLER_REGISTRY,
    # ``aldi/distill.py:17-41``) with a plain method contract.

    mutable_collections = ()  # no BatchNorm in the R-CNN family

    def forward_teacher_ctx(self, variables, images, image_sizes, rng,
                            threshold: float, max_gt: int):
        """Teacher side of one distill iteration, run outside the grad path:
        pseudo-labels + everything distill_losses later needs.

        Returns (ctx, pseudo_gt, metrics).
        """
        from ..engine.pseudolabel import detections_to_pseudo_labels

        feats, rpn_logits, rpn_deltas, dets = self.forward_teacher(
            variables, images, image_sizes
        )
        pseudo_gt = detections_to_pseudo_labels(
            *dets, threshold=threshold, max_gt=max_gt
        )
        d = self.cfg.DOMAIN_ADAPT.DISTILL
        anchor_idx = anchor_valid = anchor_fg = None
        t_obj = t_delta = None
        if d.OBJ_ENABLED or d.RPN_REG_ENABLED:
            # sample the distill anchor set against pseudo-GT (the reference
            # re-runs label_and_sample_anchors, aldi/distill.py:198-204) and
            # pre-gather the teacher head outputs at it — the distill loss
            # then never touches [B, 765k] tensors
            anchor_idx, anchor_valid, anchor_fg, _ = label_anchors_sampled(
                rng, self.anchors_cat, pseudo_gt.boxes, pseudo_gt.valid,
                batch_size_per_image=self.rpn_params["batch_size_per_image"],
                positive_fraction=self.rpn_params["positive_fraction"],
            )
            t_obj = jnp.take_along_axis(rpn_logits, anchor_idx, axis=1)
            t_delta = jnp.take_along_axis(
                rpn_deltas, anchor_idx[..., None], axis=1
            )
        ctx = {
            "feats": feats,
            "anchor_idx": anchor_idx,
            "anchor_valid": anchor_valid,
            "anchor_fg": anchor_fg,
            "t_obj": t_obj,
            "t_delta": t_delta,
        }
        metrics = {
            "num_pseudo_labels": pseudo_gt.valid.sum()
            / jnp.maximum(images.shape[0], 1)
        }
        return ctx, pseudo_gt, metrics

    def distill_losses(self, teacher_variables, ctx, s_aux):
        """Soft distillation losses between the teacher context and the
        student aux from its pseudo-GT forward (ALDIDistiller semantics,
        reference ``aldi/distill.py:188-278``)."""
        from ..engine.distill import roih_distill_losses, rpn_distill_losses

        cfg = self.cfg
        d = cfg.DOMAIN_ADAPT.DISTILL
        out = {}
        sampled = jax.lax.stop_gradient(s_aux["sampled"])
        t_cls, t_deltas, _ = self.box_head(
            teacher_variables, ctx["feats"], sampled["boxes"],
            sampled["valid"], pool_mode=self.cfg.TPU.EVAL_POOL_MODE,
        )
        t_cls = jax.lax.stop_gradient(t_cls.astype(jnp.float32))
        t_deltas = jax.lax.stop_gradient(t_deltas.astype(jnp.float32))
        if d.OBJ_ENABLED or d.RPN_REG_ENABLED:
            idx = ctx["anchor_idx"]
            s_obj = jnp.take_along_axis(s_aux["rpn_logits"], idx, axis=1)
            s_delta = jnp.take_along_axis(
                s_aux["rpn_deltas"], idx[..., None], axis=1
            )
            out.update(
                rpn_distill_losses(
                    s_obj, s_delta, ctx["t_obj"], ctx["t_delta"],
                    ctx["anchor_valid"], ctx["anchor_fg"],
                    obj_temperature=d.OBJ_TMP,
                    do_obj=d.OBJ_ENABLED,
                    do_reg=d.RPN_REG_ENABLED,
                )
            )
        if d.ROIH_CLS_ENABLED or d.ROIH_REG_ENABLED:
            out.update(
                roih_distill_losses(
                    s_aux["roih_cls_logits"], s_aux["roih_deltas"],
                    t_cls, t_deltas, sampled["valid"], self.num_classes,
                    cls_temperature=d.CLS_TMP,
                    cls_loss_type=cfg.DOMAIN_ADAPT.CLS_LOSS_TYPE,
                    do_cls=d.ROIH_CLS_ENABLED,
                    do_reg=d.ROIH_REG_ENABLED,
                )
            )
        return out

    # -------------------------------------------------------- teacher pass
    def forward_teacher(self, variables, images, image_sizes):
        """One teacher pass serving both reference passes (eval inference for
        pseudo-labels, ``aldi/pseudolabeler.py:21``, and the hooked
        train-mode forward, ``aldi/distill.py:157-162``): backbone + RPN head
        run once; detection inference uses the eval top-k path. Returns
        (features, rpn_logits_cat, rpn_deltas_cat, detections)."""
        x = self.preprocess(images)
        feats = self.backbone(variables, x)
        logits, deltas = self.rpn_head(variables, feats)
        logits_cat = jnp.concatenate(
            [l.astype(jnp.float32) for l in logits], axis=1
        )
        deltas_cat = jnp.concatenate(
            [d.astype(jnp.float32) for d in deltas], axis=1
        )
        pboxes, _, pvalid = self.proposals(logits, deltas, image_sizes, False)
        cls_logits, box_deltas, _ = self.box_head(
            variables, feats, pboxes, pvalid, pool_mode=self.cfg.TPU.EVAL_POOL_MODE
        )
        t = self.cfg.TEST
        r = self.cfg.MODEL.ROI_HEADS
        dets = fast_rcnn_inference(
            pboxes, pvalid, cls_logits, box_deltas, image_sizes,
            self.num_classes,
            score_thresh=r.SCORE_THRESH_TEST,
            nms_thresh=r.NMS_THRESH_TEST,
            topk_per_image=t.DETECTIONS_PER_IMAGE,
            box_reg_weights=self.box_reg_weights,
        )
        return feats, logits_cat, deltas_cat, dets

    # -------------------------------------------------------- align stream
    def forward_domain_align(
        self, variables, images, image_sizes, rng, domain_label: float
    ):
        """The reference's "target_weak" stream (``aldi/trainer.py:108-109``):
        a full forward where only ``_da_`` losses are kept. Here only the
        pieces alignment needs are computed: backbone features for the image
        discriminator and, if instance alignment is on, proposals + box
        features for the instance discriminator (matched against an empty
        GT set, as the reference's unlabeled mapper strips annotations)."""
        rng, k_drop = jax.random.split(rng)
        x = self.preprocess(images)
        feats = self.backbone(variables, x, train=True, rng=k_drop)
        box_feats = None
        if self.cfg.DOMAIN_ADAPT.ALIGN.INS_DA_ENABLED:
            logits, deltas = self.rpn_head(variables, feats)
            pboxes, _, pvalid = self.proposals(logits, deltas, image_sizes, True)
            pboxes = jax.lax.stop_gradient(pboxes)
            b = images.shape[0]
            g = 1  # empty gt set
            empty_boxes = jnp.zeros((b, g, 4), jnp.float32)
            empty_cls = jnp.zeros((b, g), jnp.int32)
            empty_valid = jnp.zeros((b, g), bool)
            sampled = sample_proposals(
                rng, pboxes, pvalid, empty_boxes, empty_cls, empty_valid,
                **self.roi_sample_params,
            )
            _, _, box_feats = self.box_head(
                variables, feats, sampled["boxes"], sampled["valid"]
            )
        return self._align_losses(variables, feats, box_feats, domain_label), None

    # ----------------------------------------------------------- inference
    def forward_inference(self, variables, images, image_sizes,
                          precomputed: Optional[dict] = None):
        """Detection inference on the canvas (no rescaling to original image
        space — the reference pseudo-labeler also runs with
        ``do_postprocess=False``, ``aldi/pseudolabeler.py:21``; the evaluator
        rescales on host). Returns (boxes, scores, classes, valid).

        ``precomputed``: ``MODEL.LOAD_PROPOSALS`` boxes (see
        ``forward_train``); the RPN is skipped, the box head scores the
        supplied proposals (Fast-R-CNN inference)."""
        x = self.preprocess(images)
        feats = self.backbone(variables, x)
        if precomputed is not None:
            pboxes = precomputed["boxes"]
            pvalid = precomputed["valid"]
        else:
            logits, deltas = self.rpn_head(variables, feats)
            pboxes, _, pvalid = self.proposals(
                logits, deltas, image_sizes, False
            )
        cls_logits, box_deltas, _ = self.box_head(
            variables, feats, pboxes, pvalid, pool_mode=self.cfg.TPU.EVAL_POOL_MODE
        )
        t = self.cfg.TEST
        r = self.cfg.MODEL.ROI_HEADS
        return fast_rcnn_inference(
            pboxes, pvalid, cls_logits, box_deltas, image_sizes,
            self.num_classes,
            score_thresh=r.SCORE_THRESH_TEST,
            nms_thresh=r.NMS_THRESH_TEST,
            topk_per_image=t.DETECTIONS_PER_IMAGE,
            box_reg_weights=self.box_reg_weights,
        )
