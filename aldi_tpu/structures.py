"""Padded, batched detection structures.

The reference passes ragged per-image ``Instances``/``Boxes`` objects between
stages (detectron2 structures, consumed at e.g. reference
``aldi/pseudolabeler.py:51-67``). XLA requires static shapes, so the
equivalent here is struct-of-arrays with validity masks:

- boxes are ``[..., N, 4]`` float in XYXY absolute pixel coordinates
- a parallel boolean ``valid`` mask marks real rows vs padding

These are plain pytrees (flax.struct dataclasses) that flow through jit.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Instances:
    """A padded batch of per-image instance sets.

    Mirrors the field names of the reference structures (``gt_boxes``,
    ``gt_classes``, ``scores``) so parity with reference call sites is easy to
    audit. All arrays share leading dims ``[B, N]``.
    """

    boxes: jnp.ndarray  # [B, N, 4] xyxy
    classes: jnp.ndarray  # [B, N] int32
    valid: jnp.ndarray  # [B, N] bool
    scores: jnp.ndarray = None  # [B, N] float, optional

    @property
    def num_valid(self) -> jnp.ndarray:  # [B]
        return self.valid.sum(axis=-1)

    @staticmethod
    def empty(batch: int, n: int, dtype=jnp.float32) -> "Instances":
        return Instances(
            boxes=jnp.zeros((batch, n, 4), dtype),
            classes=jnp.zeros((batch, n), jnp.int32),
            valid=jnp.zeros((batch, n), bool),
            scores=jnp.zeros((batch, n), dtype),
        )


@flax.struct.dataclass
class ImageBatch:
    """A fixed-canvas image batch.

    ``image_sizes`` holds the true (h, w) each image occupies inside the
    canvas (top-left anchored); the rest of the canvas is padding, as in the
    reference's per-batch padded ``ImageList`` but with a static canvas.
    """

    image: jnp.ndarray  # [B, H, W, 3] float or uint8, NHWC
    image_sizes: jnp.ndarray  # [B, 2] int32 (h, w) valid region
    gt: Instances = None  # optional ground truth / pseudo labels

    @property
    def canvas_hw(self):
        return self.image.shape[1], self.image.shape[2]
