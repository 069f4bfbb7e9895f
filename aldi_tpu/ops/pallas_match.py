"""Pallas TPU kernel: anchor<->GT IoU matching.

The substrate Matcher materializes the full [N_anchors, M_gt] IoU matrix in
HBM (N=765k at the Cityscapes canvas). This kernel streams anchors through
VMEM in [ROWS, 128] coordinate tiles against the (padded, VMEM-resident) GT
set, emitting per-anchor best IoU + argmax and per-block per-GT maxima (for
the RPN's low-quality matches) — no [N, M] materialization.

Layout: anchor coordinates are passed as four [N/128, 128] planes so tiles
map onto the VPU's (8, 128) lanes; GT boxes are [M<=128] broadcast along
lanes... (GT along the third axis of a [ROWS, 128, M] tile).

Falls back transparently to the XLA path on CPU (interpret mode in tests).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8  # anchor rows per grid step (ROWS*128 anchors); the [ROWS,128,128]
# f32 IoU tile and its ~6 temporaries must fit VMEM (~0.5 MB each at 8)


def _tile_iou(ax0, ay0, ax1, ay1, gt):
    """[ROWS, 128] anchor coordinate planes x [128, 4] gt -> IoU tile
    [ROWS, 128, 128]. SHARED between the matcher and the low-quality
    kernels: low_quality_mask_pallas tests exact float equality against
    maxima computed by the matcher, so both must run bit-identical math."""
    x0, y0, x1, y1 = ax0[...], ay0[...], ax1[...], ay1[...]
    area_a = (x1 - x0) * (y1 - y0)  # [R, 128]

    g = gt[...]  # [128, 4]
    gx0 = g[:, 0][None, None, :]  # [1, 1, 128]
    gy0 = g[:, 1][None, None, :]
    gx1 = g[:, 2][None, None, :]
    gy1 = g[:, 3][None, None, :]
    area_g = ((gx1 - gx0) * (gy1 - gy0))  # [1, 1, 128]

    ix = jnp.maximum(
        jnp.minimum(x1[..., None], gx1) - jnp.maximum(x0[..., None], gx0), 0.0
    )
    iy = jnp.maximum(
        jnp.minimum(y1[..., None], gy1) - jnp.maximum(y0[..., None], gy0), 0.0
    )
    inter = ix * iy  # [R, 128, 128]
    union = area_a[..., None] + area_g - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _kernel(ax0, ay0, ax1, ay1, gt, gv, vals_ref, idx_ref, gtmax_ref):
    # anchor tile [ROWS, 128]; gt [128, 4] f32; gv [128] via (1, 128)
    valid = gv[...]  # [1, 128]
    iou = _tile_iou(ax0, ay0, ax1, ay1, gt)
    iou = jnp.where(valid[None, :, :] > 0, iou, -1.0)

    vals_ref[...] = iou.max(axis=-1)
    idx_ref[...] = iou.argmax(axis=-1).astype(jnp.int32)
    # (1, 8, 128) block: sublane dim must be 8-divisible on TPU
    gtmax_ref[...] = jnp.broadcast_to(
        iou.max(axis=(0, 1))[None, None, :], (1, 8, 128)
    )


def match_iou_pallas(
    anchors: jnp.ndarray,  # [N, 4], N % (ROWS*128) == 0
    gt_boxes: jnp.ndarray,  # [M, 4], M <= 128
    gt_valid: jnp.ndarray,  # [M]
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (matched_vals [N], matched_idx [N], best_per_gt [M]).
    Invalid gt columns yield iou -1 (never matched)."""
    n = anchors.shape[0]
    m = gt_boxes.shape[0]
    assert m <= 128, m
    block = ROWS * 128
    pad_n = (-n) % block
    if pad_n:
        anchors = jnp.concatenate(
            [anchors, jnp.zeros((pad_n, 4), anchors.dtype)], 0
        )
    n_pad = anchors.shape[0]
    planes = [
        anchors[:, i].reshape(n_pad // 128, 128).astype(jnp.float32)
        for i in range(4)
    ]
    gt_pad = jnp.zeros((128, 4), jnp.float32).at[:m].set(
        gt_boxes.astype(jnp.float32)
    )
    gv_pad = jnp.zeros((1, 128), jnp.float32).at[0, :m].set(
        gt_valid.astype(jnp.float32)
    )

    grid = n_pad // block
    plane_spec = pl.BlockSpec(
        (ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    vals, idx, gtmax = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[plane_spec] * 4 + [full((128, 4)), full((1, 128))],
        out_specs=[
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*planes, gt_pad, gv_pad)

    vals = vals.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n]
    best_per_gt = gtmax.max(axis=(0, 1))[:m]
    return vals, idx, best_per_gt


def _lowq_kernel(ax0, ay0, ax1, ay1, gt, gv, best, out_ref):
    valid = gv[...]
    b = best[...]  # [1, 128]
    iou = _tile_iou(ax0, ay0, ax1, ay1, gt)
    is_best = (
        (iou == b[None, :, :]) & (valid[None, :, :] > 0) & (b[None, :, :] > 0)
    )
    out_ref[...] = is_best.any(axis=-1).astype(jnp.float32)


def low_quality_mask_pallas(
    anchors: jnp.ndarray, gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
    best_per_gt: jnp.ndarray, interpret: bool = False,
) -> jnp.ndarray:
    """[N] bool: anchor achieves some valid gt's best IoU (> 0)."""
    n = anchors.shape[0]
    m = gt_boxes.shape[0]
    block = ROWS * 128
    pad_n = (-n) % block
    if pad_n:
        anchors = jnp.concatenate(
            [anchors, jnp.full((pad_n, 4), -1e6, anchors.dtype)], 0
        )
    n_pad = anchors.shape[0]
    planes = [
        anchors[:, i].reshape(n_pad // 128, 128).astype(jnp.float32)
        for i in range(4)
    ]
    gt_pad = jnp.zeros((128, 4), jnp.float32).at[:m].set(
        gt_boxes.astype(jnp.float32)
    )
    gv_pad = jnp.zeros((1, 128), jnp.float32).at[0, :m].set(
        gt_valid.astype(jnp.float32)
    )
    best_pad = jnp.zeros((1, 128), jnp.float32).at[0, :m].set(
        best_per_gt.astype(jnp.float32)
    )
    grid = n_pad // block
    plane_spec = pl.BlockSpec(
        (ROWS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _lowq_kernel,
        grid=(grid,),
        in_specs=[plane_spec] * 4 + [full((128, 4)), full((1, 128)),
                                     full((1, 128))],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32),
        interpret=interpret,
    )(*planes, gt_pad, gv_pad, best_pad)
    return out.reshape(-1)[:n] > 0


def match_boxes_pallas(
    anchors, gt_boxes, gt_valid, thresholds, labels,
    allow_low_quality=False, interpret=False,
):
    """Full Matcher semantics on the kernels (see ops/matcher.py::match)."""
    vals, idx, best = match_iou_pallas(
        anchors, gt_boxes, gt_valid, interpret=interpret
    )
    out = jnp.full(vals.shape, labels[0], jnp.int8)
    for lo, lab in zip(thresholds, labels[1:]):
        out = jnp.where(vals >= lo, jnp.int8(lab), out)
    if allow_low_quality:
        lowq = low_quality_mask_pallas(
            anchors, gt_boxes, gt_valid, best, interpret=interpret
        )
        out = jnp.where(lowq, jnp.int8(1), out)
    return idx, out
