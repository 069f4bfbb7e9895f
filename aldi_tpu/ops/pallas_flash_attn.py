"""Pallas TPU attention kernel with decomposed relative-position bias.

Built for the ViTDet global-attention blocks (models/vit.py Attention):
N = H*W tokens (4096 at 1024x1024, 8192 at 1024x2048), head_dim 64,
decomposed rel-pos bias  bias[q, k] = Bh[q, yk] + Bw[q, xk]  where
Bh = einsum(q, Rh) and Bw = einsum(q, Rw) are [.., N, H_grid] /
[.., N, W_grid] (detectron2 ViTDet semantics, reference
`aldi/model.py` ViT lineage).

The XLA formulation materializes five+ [B, heads, N, N] f32 tensors per
block (logits, +bias_h, +bias_w, softmax, cast) — ~4 GB of HBM traffic
per image per global block at N=4096, which caps the ViTDet DAOD step at
~14% MFU. Here K and V for one (batch, head) stay VMEM-resident
(N*64*2B = 0.5-1 MB), the grid walks q-tiles, and each step computes

    logits = q_tile @ K^T * scale            (MXU, f32 accumulate)
    logits += repeat_interleave(Bh_tile, W)  (k index = yk*W + xk)
    logits += tile(Bw_tile, H)
    p = softmax(logits)                      (full row in VMEM: exact)
    out_tile = p @ V                         (MXU)

so nothing N^2 ever touches HBM. N is small enough that the whole row
fits VMEM — no running-max streaming needed, this is exact softmax.

Backward recomputes p per q-tile (flash-style), produces dq/dk/dv plus
the bias cotangents dBh/dBw via in-kernel segment sums over the k axis;
dk/dv accumulate in VMEM scratch across q-tiles and flush on the last
grid step. The rel-pos chain rule back to Rh/Rw and q happens in XLA
(small einsums) inside the custom_vjp wrapper.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q_tile(n):
    """q rows per grid step: keep the [TQ, N] f32 row block ~<= 4 MB."""
    return min(n, max(128, min(512, (1 << 20) // n // 128 * 128)))


def _q_tile_bwd(n):
    """Backward keeps ~4 live [TQ, N] f32 buffers (logits/p/dp/ds) plus
    the dk/dv accumulators and bias expanders — half the forward tile."""
    return min(n, max(64, _q_tile(n) // 2))


def _expand_h(h_grid, w_grid):
    """[h_grid, N] one-hot: E[y, y*w_grid + x] = 1. Interleave-expands a
    [TQ, h_grid] column block to [TQ, N] as an MXU matmul (Mosaic rejects
    the equivalent 3-D broadcast+reshape on the lane axis)."""
    n = h_grid * w_grid
    rows = jax.lax.broadcasted_iota(jnp.int32, (h_grid, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h_grid, n), 1)
    return (rows == cols // w_grid).astype(jnp.float32)


def _expand_w(h_grid, w_grid):
    """[w_grid, N] one-hot: E[x, y*w_grid + x] = 1 (tile pattern)."""
    n = h_grid * w_grid
    rows = jax.lax.broadcasted_iota(jnp.int32, (w_grid, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w_grid, n), 1)
    return (rows == cols % w_grid).astype(jnp.float32)


def _bias_tile(bh_blk, bw_blk, h_grid, w_grid, tq):
    """[TQ, N] bias from decomposed blocks [TQ, h_grid] / [TQ, w_grid];
    k index = yk * w_grid + xk."""
    bh = jnp.dot(bh_blk, _expand_h(h_grid, w_grid),
                 preferred_element_type=jnp.float32)
    bw = jnp.dot(bw_blk, _expand_w(h_grid, w_grid),
                 preferred_element_type=jnp.float32)
    return bh + bw


def _fwd_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, *, scale,
                h_grid, w_grid):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    tq = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TQ, N]
    logits += _bias_tile(bh_ref[0].astype(jnp.float32),
                         bw_ref[0].astype(jnp.float32),
                         h_grid, w_grid, tq)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, do_ref,
                dq_ref, dbh_ref, dbw_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale, h_grid, w_grid):
    qi = pl.program_id(1)
    nq = pl.num_programs(1)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    tq = q.shape[0]

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    logits += _bias_tile(bh_ref[0].astype(jnp.float32),
                         bw_ref[0].astype(jnp.float32),
                         h_grid, w_grid, tq)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)  # [TQ, N] f32

    do = do_ref[0].astype(jnp.float32)  # [TQ, D]
    # dv += p^T @ do
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = do @ v^T ; ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))  # [TQ, N]

    # bias cotangents: dBh[q, yk] = sum_xk ds ; dBw[q, xk] = sum_yk ds
    # (segment sums over the k axis as matmuls with the one-hot expanders)
    dbh_ref[0] = jax.lax.dot_general(
        ds, _expand_h(h_grid, w_grid), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dbh_ref.dtype)
    dbw_ref[0] = jax.lax.dot_general(
        ds, _expand_w(h_grid, w_grid), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dbw_ref.dtype)

    # dq = (ds @ K) * scale ; dk += ds^T @ q * scale
    dq_ref[0] = (jnp.dot(
        ds.astype(k.dtype), k,
        preferred_element_type=jnp.float32,
    ) * scale).astype(dq_ref.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attn(q, k, v, bh, bw, scale, h_grid, w_grid, interpret):
    return _attn_fwd(q, k, v, bh, bw, scale, h_grid, w_grid, interpret)[0]


def _attn_fwd(q, k, v, bh, bw, scale, h_grid, w_grid, interpret):
    """q/k/v: [G, N, D] (G = batch*heads); bh: [G, N, h_grid];
    bw: [G, N, w_grid]. Returns [G, N, D]."""
    g, n, d = q.shape
    tq = _q_tile(n)
    grid = (g, n // tq)
    kern = functools.partial(
        _fwd_kernel, scale=scale, h_grid=h_grid, w_grid=w_grid
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, tq, h_grid), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi: (gi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda gi, qi: (gi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((g, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bh, bw)
    return out, (q, k, v, bh, bw)


def _attn_bwd(scale, h_grid, w_grid, interpret, res, g_out):
    q, k, v, bh, bw = res
    g, n, d = q.shape
    tq = _q_tile_bwd(n)
    grid = (g, n // tq)
    kern = functools.partial(
        _bwd_kernel, scale=scale, h_grid=h_grid, w_grid=w_grid
    )
    dq, dbh, dbw, dk, dv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, tq, h_grid), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, tq, d), lambda gi, qi: (gi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, tq, h_grid), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi: (gi, qi, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
            pl.BlockSpec((1, n, d), lambda gi, qi: (gi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, d), q.dtype),
            jax.ShapeDtypeStruct((g, n, h_grid), bh.dtype),
            jax.ShapeDtypeStruct((g, n, w_grid), bw.dtype),
            jax.ShapeDtypeStruct((g, n, d), k.dtype),
            jax.ShapeDtypeStruct((g, n, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bh, bw, g_out)
    return dq, dk, dv, dbh, dbw


_attn.defvjp(_attn_fwd, _attn_bwd)


def flash_attention_relpos(q, k, v, bh, bw, scale, h_grid, w_grid,
                           interpret=False):
    """Exact softmax(q k^T * scale + decomposed rel-pos bias) v.

    q/k/v: [G, N, D] with N = h_grid * w_grid (k raster order, x fastest);
    bh: [G, N, h_grid] (bias toward k-row yk); bw: [G, N, w_grid].
    Differentiable in q, k, v, bh, bw.
    """
    return _attn(q, k, v, bh, bw, scale, h_grid, w_grid, interpret)
