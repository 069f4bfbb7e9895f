"""Multi-scale deformable attention sampling (MSDeformAttn core).

The reference requires a custom CUDA extension for this op
(``aldi/detr/libs/.../ops/make.sh``; "CUDA/GPU access is required",
reference ``README.md:69-74``) and disables AMP because of it. Here the op
is a pure-XLA formulation, differentiable and bf16-safe.

TPU gather layout matters enormously; three formulations were measured on
v5e at encoder shapes (B=2, Lq=8500, H=8, D=32, L=4, P=4):

1. batched ``take_along_axis`` over ``[B, H, Lv, D]``: catastrophic
   per-sublane lowering — 260 ms/encoder layer.
2. flat ``jnp.take`` row gathers, one per (level, corner): ~45 ms. The
   gather is bound by ROW COUNT (~0.4G rows/s regardless of row width),
   and this shape needs B*Lq*H*L*P*4 = 4.4M rows.
3. THIS FILE: per-level 2x2-QUAD tables. For each level, a one-cell
   zero halo is padded around the grid and the four cells of every
   bilinear footprint are pre-concatenated into one row of a
   ``[B*(H_l+1)*(W_l+1)*H, 4*D]`` table (a handful of big contiguous
   copies). Every sample then needs ONE gathered row — 4x fewer rows —
   and the halo reproduces grid_sample's zero padding exactly, so no
   per-corner bounds masks are needed (only a cheap per-sample
   "footprint overlaps the level" mask). Measured 26.7 ms/encoder layer
   (B=2) -- 3x over (1); the gather then runs at zero wasted bytes.
4. (round 3) keep the gathered samples LANE-FLAT: the natural
   ``[.., 4, D]`` corner view tile-pads 8x on TPU ((4, 32) trailing
   dims); staying in ``[.., 4*D]`` rows with the corner+point reduce as
   one MXU matmul against a stacked-identity matrix cuts the layer to
   16 ms fwd / 75 ms fwd+bwd (B=2) — ~35 GB/s effective gather, at the
   gather/scatter data-movement floor.

Semantics match the reference op: ``grid_sample`` bilinear with
align_corners=False and zero padding outside each level.
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# Queries are processed in chunks of this size (lax.map) so the sampling
# intermediates stay bounded. v5e sweep at encoder shapes B=2 Lq=8500,
# fwd+grad: 73.7 ms at QC=256, 75.5 at 512, 87.4 at 1024, 104 unchunked —
# 256 measured fastest; small chunks keep the [Cq, 4D] temporaries
# resident in VMEM across the remat recompute.
QUERY_CHUNK = 256
# At protocol scale the tradeoff flips: more chunks = more lax.map steps
# whose per-step scheduling overhead dominates once the per-chunk gather is
# HBM-bound anyway. v5e sweep at 800x1344 encoder shapes (B=2 Lq=22323),
# fwd+grad per layer: 236 ms at QC=256, 278 at 512, **205 at 1024**, 212
# at 2048 (tools/profile_msda_roofline.py, MSDA_ROOFLINE.json) — 13%
# faster at 1024. Threshold at ~1.5x the 640^2 query count.
QUERY_CHUNK_LARGE = 1024
LARGE_LQ = 12000


def _query_chunk(lq: int) -> int:
    return QUERY_CHUNK_LARGE if lq > LARGE_LQ else QUERY_CHUNK


def ms_deform_attn_core(
    value: jnp.ndarray,  # [B, Lv, H, D] flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] per level
    sampling_locations: jnp.ndarray,  # [B, Lq, H, L, P, 2] normalized (x, y)
    attention_weights: jnp.ndarray,  # [B, Lq, H, L, P]
) -> jnp.ndarray:
    """Returns [B, Lq, H*D]."""
    b, lv, h, d = value.shape
    _, lq = sampling_locations.shape[:2]
    npoints = sampling_locations.shape[4]

    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    h_idx = jnp.arange(h, dtype=jnp.int32)[None, None, :, None]
    # fixed corner-sum matrix: [4D, D] block of stacked identities. The
    # corner/point reduce runs as ONE MXU matmul in the flat [.., 4D] lane
    # layout instead of an [..., 4, D] reduction — the latter's trailing
    # (4, 32) dims tile-pad 8x on TPU and dominated the backward (measured
    # 114.5 -> 75.5 ms fwd+grad per encoder layer, B=2 Lq=8500, v5e).
    corner_sum = jnp.tile(jnp.eye(d, dtype=value.dtype), (4, 1))

    out = jnp.zeros((b, lq, h, d), jnp.float32)
    start = 0
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        # ---- quad table: one row = the 2x2 bilinear footprint of one
        # (anchor, head); zero halo on every side so partially-outside
        # footprints read exact zeros
        v = value[:, start:start + hh * ww].reshape(b, hh, ww, h, d)
        start += hh * ww
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        a_h, a_w = hh + 1, ww + 1  # anchor lattice (top-left corner cell)
        quad = jnp.stack(
            [vp[:, :-1, :-1], vp[:, :-1, 1:],
             vp[:, 1:, :-1], vp[:, 1:, 1:]],
            axis=4,
        )  # [B, a_h, a_w, H, 4, D]
        table = quad.reshape(b * a_h * a_w * h, 4 * d)

        @jax.checkpoint
        def sample_block(args):
            loc, w_attn = args  # [B, Cq, H, P, 2] / [B, Cq, H, P]
            cq = loc.shape[1]
            # grid_sample align_corners=False: pixel = loc * size - 0.5
            x = loc[..., 0] * ww - 0.5
            y = loc[..., 1] * hh - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx = x - x0  # [B, Cq, H, P]
            ly = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

            # footprint overlaps the level <=> y0 in [-1, hh-1] etc.;
            # inside that range the halo makes the quad row exact
            ok = (
                (y0i >= -1) & (y0i <= hh - 1)
                & (x0i >= -1) & (x0i <= ww - 1)
            )
            ya = jnp.clip(y0i + 1, 0, hh)
            xa = jnp.clip(x0i + 1, 0, ww)
            anchor = ya * a_w + xa
            rows = ((b_idx * (a_h * a_w) + anchor) * h + h_idx).reshape(-1)
            got = jnp.take(table, rows, axis=0)  # [S, 4D], value dtype
            got = got.reshape(b, cq, h, npoints, 4 * d)

            # bilinear corner weights folded with the attention weight and
            # the validity mask, expanded onto the flat 4D lane axis: one
            # f32 multiply, then the corner+point reduce as an MXU matmul
            wk = w_attn * ok  # [B, Cq, H, P]
            cw = jnp.stack(
                [(1 - ly) * (1 - lx) * wk, (1 - ly) * lx * wk,
                 ly * (1 - lx) * wk, ly * lx * wk],
                axis=-1,
            )  # [B, Cq, H, P, 4]
            cwx = jnp.broadcast_to(
                cw[..., None], cw.shape + (d,)
            ).reshape(b, cq, h, npoints, 4 * d)
            weighted = got.astype(jnp.float32) * cwx
            return jnp.einsum(
                "bqhpe,ed->bqhd", weighted.astype(value.dtype),
                corner_sum, preferred_element_type=jnp.float32,
            )

        loc_l = sampling_locations[:, :, :, lvl]  # [B, Lq, H, P, 2]
        w_l = attention_weights[:, :, :, lvl]  # [B, Lq, H, P]
        qc = _query_chunk(lq)
        if lq <= qc:
            out = out + sample_block((loc_l, w_l))
        else:
            nch = -(-lq // qc)
            pad = nch * qc - lq
            locp = jnp.pad(loc_l, ((0, 0), (0, pad)) + ((0, 0),) * 3)
            wp = jnp.pad(w_l, ((0, 0), (0, pad)) + ((0, 0),) * 2)
            # chunk axis leads so lax.map scans over it
            locp = locp.reshape(b, nch, qc, h, npoints, 2)
            wp = wp.reshape(b, nch, qc, h, npoints)
            part = jax.lax.map(
                sample_block,
                (locp.transpose(1, 0, 2, 3, 4, 5),
                 wp.transpose(1, 0, 2, 3, 4)),
            )  # [nch, B, Cq, H, D]
            part = part.transpose(1, 0, 2, 3, 4).reshape(
                b, nch * qc, h, d)
            out = out + part[:, :lq]
    return out.reshape(b, lq, h * d)
