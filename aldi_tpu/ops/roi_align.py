"""ROIAlign (V2/aligned) over a multi-level feature pyramid, XLA-native.

Replaces the substrate's C++/CUDA ROIAlign behind ``roi_heads.box_pooler``
(SURVEY.md section 2.3; pooler resolution 7, reference
``configs/detectron2/Base-RCNN-FPN.yaml:27``).

TPU formulation: instead of per-level dynamic partitioning of boxes (ragged),
all pyramid levels are flattened row-major and concatenated into one
``[sum(H_l*W_l), C]`` table per image. Each box computes its FPN level
(canonical heuristic), and every bilinear corner becomes one row index into
the table — a single large gather, batched over boxes/bins/samples, with no
data-dependent shapes. Padding boxes gather row 0 with weight 0.

sampling_ratio is fixed at 2 (the substrate's adaptive ``ceil(bin)`` resolves
to 2 for canonically-sized ROIs; fixed value keeps shapes static).
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp


def assign_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level per box ([P, 4] -> [P] int32), substrate heuristic."""
    area = jnp.clip(
        (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1]), 0
    )
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def _bilinear_params(coord, size):
    """Clamped bilinear corner indices + weights for 1-D continuous coords."""
    oob = (coord < -1.0) | (coord > size)
    c = jnp.clip(coord, 0.0, None)
    low = jnp.clip(c.astype(jnp.int32), 0, size - 1)
    at_edge = low >= size - 1
    low = jnp.where(at_edge, size - 1, low)
    high = jnp.where(at_edge, size - 1, low + 1)
    c = jnp.where(at_edge, low.astype(c.dtype), c)
    l_w = c - low.astype(c.dtype)
    return low, high, l_w, oob


def roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    box_valid: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    mode: str = "corner_gather",
) -> jnp.ndarray:
    """Multi-level ROIAlign for ONE image.

    Args:
      features: per-level [H_l, W_l, C] arrays (finest first).
      boxes: [P, 4] xyxy in image coordinates.
      box_valid: [P] bool.
      strides: per-level feature strides.
      mode: "corner_gather" (4 row gathers per sample, default) or
        "slice2x2" (one (2, 2C)-slice gather per sample). slice2x2 is ~50x
        faster in isolation on v5e but regressed the fused train step 8x
        (XLA chose a pathological layout/scatter for the big graph) — kept
        for further investigation, do not enable by default.

    Returns [P, output_size, output_size, C].
    """
    c = features[0].shape[-1]
    hs = jnp.asarray([f.shape[0] for f in features], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)

    import math

    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    lvl = assign_levels(boxes, min_level, max_level)  # [P]

    scale = scales[lvl]  # [P]
    h_l, w_l = hs[lvl], ws[lvl]

    boxes_f = boxes.astype(jnp.float32)
    # aligned=True: half-pixel offset on the start coordinate
    x0 = boxes_f[:, 0] * scale - 0.5
    y0 = boxes_f[:, 1] * scale - 0.5
    x1 = boxes_f[:, 2] * scale - 0.5
    y1 = boxes_f[:, 3] * scale - 0.5
    roi_w = x1 - x0
    roi_h = y1 - y0
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    sr = sampling_ratio
    # sample grid: [P, out, sr] continuous coords per axis
    bin_idx = jnp.arange(output_size, dtype=jnp.float32)
    s_idx = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    ys = (
        y0[:, None, None]
        + (bin_idx[None, :, None] + s_idx[None, None, :]) * bin_h[:, None, None]
    )  # [P, out, sr]
    xs = (
        x0[:, None, None]
        + (bin_idx[None, :, None] + s_idx[None, None, :]) * bin_w[:, None, None]
    )

    y_low, y_high, ly, y_oob = _bilinear_params(ys, h_l[:, None, None])
    x_low, x_high, lx, x_oob = _bilinear_params(xs, w_l[:, None, None])
    hy, hx = 1.0 - ly, 1.0 - lx

    # per-corner bilinear weights on the [P, oy, sy, ox, sx] sample lattice
    oob = y_oob[:, :, :, None, None] | x_oob[:, None, None, :, :]
    invalid = oob | (~box_valid[:, None, None, None, None])

    if mode == "corner_gather":
        hy_g = hy[:, :, :, None, None]
        ly_g = ly[:, :, :, None, None]
        hx_g = hx[:, None, None, :, :]
        lx_g = lx[:, None, None, :, :]
        zero = jnp.asarray(0.0, jnp.float32)
        w_ll = jnp.where(invalid, zero, hy_g * hx_g)
        w_lh = jnp.where(invalid, zero, hy_g * lx_g)
        w_hl = jnp.where(invalid, zero, ly_g * hx_g)
        w_hh = jnp.where(invalid, zero, ly_g * lx_g)

        sizes = [int(f.shape[0]) * int(f.shape[1]) for f in features]
        offsets = jnp.asarray(
            [0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]), jnp.int32
        )
        table = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)
        w_row = w_l[:, None, None]
        base = offsets[lvl][:, None, None, None, None]

        def flat_idx(yv, xv):
            return base + (
                yv[:, :, :, None, None] * w_row[:, :, :, None, None]
                + xv[:, None, None, :, :]
            )

        def g(idx, w):
            # gather in the features' native dtype; accumulate in f32
            vals = jnp.take(table, idx.reshape(-1), axis=0)
            return (
                vals.reshape(idx.shape + (c,)).astype(jnp.float32)
                * w[..., None]
            )

        acc = (
            g(flat_idx(y_low, x_low), w_ll)
            + g(flat_idx(y_low, x_high), w_lh)
            + g(flat_idx(y_high, x_low), w_hl)
            + g(flat_idx(y_high, x_high), w_hh)
        )
        out = acc.mean(axis=(2, 4))
        return out.astype(features[0].dtype)

    assert mode == "slice2x2", mode
    sl = (slice(None), slice(None), slice(None), None, None)  # y dims
    sx_ = (slice(None), None, None, slice(None), slice(None))  # x dims
    wy = jnp.stack([hy[sl] * jnp.ones_like(lx[sx_]),
                    ly[sl] * jnp.ones_like(lx[sx_])], -1)  # [..., 2]
    wx = jnp.stack([hx[sx_] * jnp.ones_like(ly[sl]),
                    lx[sx_] * jnp.ones_like(ly[sl])], -1)
    w = wy[..., :, None] * wx[..., None, :]  # [P, oy, sy, ox, sx, 2, 2]
    w = jnp.where(invalid[..., None, None], 0.0, w)

    # one 2x2-footprint slice-gather per SAMPLE instead of four row gathers
    # per corner: levels are stacked as [H_l, Wmax*C] rows (+C columns and
    # one extra row so edge slices read zero padding; edge corners carry
    # weight 0, so the padding never contributes).
    wmax = max(int(f.shape[1]) for f in features)
    rows = []
    for f in features:
        r = f.reshape(f.shape[0], f.shape[1] * c)
        if f.shape[1] < wmax:
            r = jnp.pad(r, ((0, 0), (0, (wmax - f.shape[1]) * c)))
        rows.append(r)
    table2d = jnp.concatenate(rows, axis=0)
    table2d = jnp.pad(table2d, ((0, 1), (0, c)))
    row_offsets = jnp.asarray(
        [0] + list(jnp.cumsum(jnp.asarray([f.shape[0] for f in features]))[:-1]),
        jnp.int32,
    )

    y_b = jnp.broadcast_to(y_low[sl], invalid.shape)
    x_b = jnp.broadcast_to(x_low[sx_], invalid.shape)
    y_glob = row_offsets[lvl][:, None, None, None, None] + y_b
    starts = jnp.stack(
        [y_glob.reshape(-1), (x_b * c).reshape(-1)], axis=-1
    ).astype(jnp.int32)

    gathered = jax.lax.gather(
        table2d,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2 * c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [N, 2, 2C]
    vals = gathered.reshape(invalid.shape + (2, 2, c)).astype(jnp.float32)
    acc = (vals * w[..., None]).sum(axis=(-3, -2))
    # average the sr x sr samples per bin: [P, oy, sy, ox, sx, C]
    out = acc.mean(axis=(2, 4))  # [P, out_y, out_x, C]
    return out.astype(features[0].dtype)


def roi_align_batched(features, boxes, box_valid, strides, output_size=7,
                      sampling_ratio=2, mode="corner_gather"):
    """vmap over the batch dim: features per-level [B, H, W, C], boxes
    [B, P, 4], box_valid [B, P] -> [B, P, out, out, C]."""
    fn = partial(
        roi_align,
        strides=strides,
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        mode=mode,
    )
    return jax.vmap(lambda fs, b, v: fn(list(fs), b, v))(
        tuple(features), boxes, box_valid
    )
