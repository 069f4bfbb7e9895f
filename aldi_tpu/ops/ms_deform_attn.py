"""Multi-scale deformable attention sampling (MSDeformAttn core).

The reference requires a custom CUDA extension for this op
(``aldi/detr/libs/.../ops/make.sh``; "CUDA/GPU access is required",
reference ``README.md:69-74``) and disables AMP because of it. Here the op
is a pure-XLA formulation, differentiable and bf16-safe.

TPU gather layout matters enormously. The obvious formulation — a batched
``take_along_axis`` over a ``[B, H, Lv, D]`` table — lowers to a
catastrophic per-sublane gather on v5e (measured 1213 ms for one
Lq=8500 corner pass; the whole op 40 ms/encoder-layer). A flat ``jnp.take``
over a 2-D row table runs ~250x faster (4.9 ms for the same pass). So all
four bilinear corners of all levels/points are fetched with flat row
gathers from a single ``[B*Lv*(H/G), G*D]`` table, where G =
``head_group`` packs G heads into one gathered row:

- G=H (512B rows, bf16): widest rows, most HBM-friendly gather, but
  gathers H/G=1 -> every sample fetches all heads' channels (HxD) and
  selects its own head afterwards — 8x raw traffic.
- G=1 (64B rows): ideal traffic, narrow-row gather.
The default G is chosen by measurement on v5e (see ``DEFAULT_HEAD_GROUP``).

Semantics match the reference op: ``grid_sample`` bilinear with
align_corners=False and zero padding outside each level.
"""

from typing import Sequence, Tuple

import jax.numpy as jnp

# Measured on TPU v5e (see tools/profile_detr_ops.py): row width vs gather
# rate tradeoff. Overridable per call.
DEFAULT_HEAD_GROUP = 8


def ms_deform_attn_core(
    value: jnp.ndarray,  # [B, Lv, H, D] flattened levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(h, w)] per level
    sampling_locations: jnp.ndarray,  # [B, Lq, H, L, P, 2] normalized (x, y)
    attention_weights: jnp.ndarray,  # [B, Lq, H, L, P]
    head_group: int = None,
) -> jnp.ndarray:
    """Returns [B, Lq, H*D]."""
    b, lv, h, d = value.shape
    _, lq = sampling_locations.shape[:2]
    npoints = sampling_locations.shape[4]
    g = DEFAULT_HEAD_GROUP if head_group is None else head_group
    g = min(g, h)
    assert h % g == 0, (h, g)
    hg = h // g  # row groups per head axis

    level_sizes = [hh * ww for hh, ww in spatial_shapes]
    level_starts = [0]
    for s in level_sizes[:-1]:
        level_starts.append(level_starts[-1] + s)

    # one flat row table: row (b, pos, head_group) -> G*D channels
    table = value.reshape(b * lv * hg, g * d)

    # index prefix per (b, q, h): (b*Lv + pos)*hg + h//g; h%g selects the
    # head slice inside the gathered row
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None, None, None]
    hq_idx = (jnp.arange(h, dtype=jnp.int32) // g)[None, None, :, None]
    hs_idx = (jnp.arange(h, dtype=jnp.int32) % g)[None, None, :, None]

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
            pos = level_starts[lvl] + jnp.clip(yi, 0, hh - 1) * ww + \
                jnp.clip(xi, 0, ww - 1)  # [B, Lq, H, P]
            rows = ((b_idx * lv + pos) * hg + hq_idx).reshape(-1)
            got = jnp.take(table, rows, axis=0)  # [B*Lq*H*P, G*D]
            got = got.reshape(b, lq, h, npoints, g, d)
            if g > 1:
                got = jnp.take_along_axis(
                    got, hs_idx[..., None, None], axis=4
                )
            sel = got.reshape(b, lq, h, npoints, d)
            return sel.astype(jnp.float32) * (w * inb)[..., None]

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
