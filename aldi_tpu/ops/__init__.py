from . import anchors, boxes, losses, matcher, nms, roi_align  # noqa: F401
