"""Model registry and builder.

Replaces the substrate META_ARCH_REGISTRY + the reference's dynamic mixin
composer ``build_aldi`` (``aldi/model.py:12-31``). Mixin composition is not
needed in the functional design: align/distill behavior is config-driven
inside the detector's forward functions, keyed by the same YAML names
(DOMAIN_ADAPT.ALIGN.MIXIN_NAME etc. are accepted and validated for config
compatibility).
"""

from ..utils.registry import Registry
from .detr import DETRDetector  # noqa: F401
from .rcnn import RCNN, RCNNDetector, grad_reverse  # noqa: F401
from .yolo import YoloDetector  # noqa: F401

META_ARCH_REGISTRY = Registry("META_ARCH")
META_ARCH_REGISTRY.register(RCNNDetector, name="GeneralizedRCNN")
META_ARCH_REGISTRY.register(YoloDetector, name="Yolo")
META_ARCH_REGISTRY.register(DETRDetector, name="DeformableDETR")


def build_detector(cfg):
    """cfg -> detector orchestrator (the reference's ``build_aldi``)."""
    name = cfg.MODEL.META_ARCHITECTURE
    if cfg.MODEL.LOAD_PROPOSALS and name != "GeneralizedRCNN":
        # precomputed proposals are a two-stage (Fast-R-CNN) concept; the
        # substrate likewise only consumes them through ROI-heads models
        raise NotImplementedError(
            f"MODEL.LOAD_PROPOSALS requires GeneralizedRCNN (got {name})"
        )
    return META_ARCH_REGISTRY.get(name)(cfg)
