"""Pseudo-label generation from teacher detections, on-device.

Replaces reference ``aldi/pseudolabeler.py``: teacher inference on
weakly-augmented target images (``do_postprocess=False`` — canvas
coordinates, ``pseudolabeler.py:21``), score thresholding
(``pseudolabeler.py:51-67``), and attaching the result as ground truth for
both the weak and strong views. No host round-trip, no in-place dict
mutation: detections stay on device and become a padded Instances pytree.
"""

import jax.numpy as jnp

from ..structures import Instances


def detections_to_pseudo_labels(
    boxes: jnp.ndarray,  # [B, D, 4]
    scores: jnp.ndarray,  # [B, D]
    classes: jnp.ndarray,  # [B, D]
    valid: jnp.ndarray,  # [B, D]
    threshold: float,
    max_gt: int,
) -> Instances:
    """Threshold detections and pad/trim to max_gt rows per image.

    Detections arrive sorted by score (inference top-k), so truncation keeps
    the highest-scoring boxes.
    """
    keep = valid & (scores > threshold)
    d = boxes.shape[1]
    if d >= max_gt:
        boxes, scores, classes, keep = (
            boxes[:, :max_gt], scores[:, :max_gt], classes[:, :max_gt],
            keep[:, :max_gt],
        )
    else:
        pad = max_gt - d
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        classes = jnp.pad(classes, ((0, 0), (0, pad)))
        keep = jnp.pad(keep, ((0, 0), (0, pad)))
    return Instances(
        boxes=jnp.where(keep[..., None], boxes, 0.0),
        classes=jnp.where(keep, classes, 0).astype(jnp.int32),
        valid=keep,
        scores=jnp.where(keep, scores, 0.0),
    )
