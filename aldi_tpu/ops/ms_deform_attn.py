"""Multi-scale deformable attention sampling (MSDeformAttn core).

The reference requires a custom CUDA extension for this op
(``aldi/detr/libs/.../ops/make.sh``; "CUDA/GPU access is required",
reference ``README.md:69-74``) and disables AMP because of it. Here the op
is a pure-XLA formulation: all pyramid levels are flattened into one value
table and every (query, head, level, point) bilinear corner becomes one row
gather — the same memory traffic pattern as the CUDA kernel, fused by XLA,
differentiable, and bf16-safe. A Pallas kernel slot exists for further
fusion (see ops/pallas/).

Semantics match the reference op: ``grid_sample`` bilinear with
align_corners=False and zero padding outside each level.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp


def ms_deform_attn_core(
    value: jnp.ndarray,  # [B, Lv, H, D] flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] per level
    sampling_locations: jnp.ndarray,  # [B, Lq, H, L, P, 2] normalized (x, y)
    attention_weights: jnp.ndarray,  # [B, Lq, H, L, P]
) -> jnp.ndarray:
    """Returns [B, Lq, H*D]."""
    b, lv, h, d = value.shape
    _, lq = sampling_locations.shape[:2]
    nlevels = len(spatial_shapes)
    npoints = sampling_locations.shape[4]

    level_sizes = [hh * ww for hh, ww in spatial_shapes]
    level_starts = [0]
    for s in level_sizes[:-1]:
        level_starts.append(level_starts[-1] + s)

    # per-head value table for per-head gathers
    value_t = value.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, H, Lv, D]

    out = jnp.zeros((b, lq, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]  # [B, Lq, H, P, 2]
        w_attn = attention_weights[:, :, :, lvl]  # [B, Lq, H, P]
        # grid_sample align_corners=False: pixel coords = loc * size - 0.5
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(yi, xi, w):
            inb = (yi >= 0) & (yi < hh) & (xi >= 0) & (xi < ww)
            idx = level_starts[lvl] + jnp.clip(yi, 0, hh - 1) * ww + jnp.clip(
                xi, 0, ww - 1
            )  # [B, Lq, H, P]
            idx_t = idx.transpose(0, 2, 1, 3).reshape(b, h, lq * npoints)
            g = jnp.take_along_axis(
                value_t, idx_t[..., None].astype(jnp.int32), axis=2
            )  # [B, H, Lq*P, D]
            g = g.reshape(b, h, lq, npoints, d).transpose(0, 2, 1, 3, 4)
            return g * (w * inb)[..., None]

        wll = (1 - ly) * (1 - lx)
        wlh = (1 - ly) * lx
        whl = ly * (1 - lx)
        whh = ly * lx
        sampled = (
            corner(y0i, x0i, wll)
            + corner(y0i, x0i + 1, wlh)
            + corner(y0i + 1, x0i, whl)
            + corner(y0i + 1, x0i + 1, whh)
        )  # [B, Lq, H, P, D]
        out = out + (sampled * w_attn[..., None]).sum(axis=3)
    return out.reshape(b, lq, h * d)
