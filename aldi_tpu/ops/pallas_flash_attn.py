"""Pallas TPU attention kernel with decomposed relative-position bias.

Built for the ViTDet global-attention blocks (models/vit.py Attention):
N = H*W tokens (4096 at 1024x1024, 8192 at 1024x2048), head_dim 64,
decomposed rel-pos bias  bias[q, k] = Bh[q, yk] + Bw[q, xk]  where
Bh = einsum(q, Rh) and Bw = einsum(q, Rw) are [.., N, H_grid] /
[.., N, W_grid] (detectron2 ViTDet semantics).

The XLA formulation materializes five+ [B, heads, N, N] f32 tensors per
block (logits, +bias_h, +bias_w, softmax, cast) — ~4 GB of HBM traffic
per image per global block at N=4096, capping the ViTDet DAOD step at
~14% MFU. Here nothing N^2 ever touches HBM:

- grid (G, N/TQ, N/TK): standard online-softmax flash forward over
  k-tiles, with the bias built per tile on the MXU from one-hot
  "expander" matmuls (k index = yk*W + xk: Bh interleave-expands, Bw
  tiles; Mosaic rejects the equivalent lane-axis 3-D broadcast+reshape).
  The forward also emits the log-sum-exp rows, so the backward is a
  single tiled pass.
- backward: same grid; recomputes each probability tile from LSE,
  accumulates dq/dbw in per-q-tile scratch (flushed on the last k step)
  and dk/dv in whole-[N, D] f32 scratch (flushed on the final step);
  delta = rowsum(do * out) is precomputed in XLA. dBh is written
  directly per (q-tile, k-tile) block — the tile width is a whole number
  of grid rows, so the bias slices line up statically.

All per-step buffers are [TQ, TK] (~1 MB), independent of N, so the
kernel scales to any token count (measured at N=4096 and N=8192).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _q_tile(n):
    return min(n, 256)


def _k_tile(n, w_grid, backward=False):
    """k columns per tile: a multiple of w_grid near 1024 so every tile
    covers whole grid rows (bias expanders tile-invariant); full row when
    n is small. The forward takes the whole row up to N=4096 (skips
    per-tile init/flush + accumulator corrections, ~10% on ViTDet-B); the
    backward must stay tiled there — its [N, D] dk/dv scratches +
    full-row buffers overflow the 16 MB scoped-VMEM stack at tk=4096.

    Above the full-row cap, only exact tilings are valid: tk must divide
    n (else trailing keys are dropped from the softmax), be a multiple of
    8 (dk/dv scratch row slices), and cover a multiple of 8 whole grid
    rows (the bias block is [rpt, TQ]-tiled). Returns None when no such
    tile exists — callers fall back to the XLA path (see
    `supported_shape`)."""
    cap = 2048 if backward else 4096
    if n <= cap:
        return n
    best = None
    tk = w_grid
    while tk <= cap:
        if n % tk == 0 and tk % 8 == 0 and (tk // w_grid) % 8 == 0:
            # prefer ~1024 columns (VMEM vs per-tile overhead sweet spot)
            if best is None or abs(tk - 1024) < abs(best - 1024):
                best = tk
        tk += w_grid
    return best


def supported_shape(n, w_grid):
    """True iff the kernel's forward AND backward tilings exactly cover
    all N tokens (no silently-dropped trailing queries/keys). Dispatch
    sites must check this and keep the XLA formulation otherwise."""
    if n % _q_tile(n) != 0:
        return False
    if n % w_grid != 0:
        return False
    return (_k_tile(n, w_grid) is not None
            and _k_tile(n, w_grid, backward=True) is not None)


def _expand_h(h_rows, w_grid):
    """[h_rows, h_rows*w_grid] one-hot: E[y, y*w_grid + x] = 1."""
    n = h_rows * w_grid
    rows = jax.lax.broadcasted_iota(jnp.int32, (h_rows, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h_rows, n), 1)
    return (rows == cols // w_grid).astype(jnp.float32)


def _expand_w(h_rows, w_grid):
    """[w_grid, h_rows*w_grid] one-hot: E[x, y*w_grid + x] = 1."""
    n = h_rows * w_grid
    rows = jax.lax.broadcasted_iota(jnp.int32, (w_grid, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w_grid, n), 1)
    return (rows == cols % w_grid).astype(jnp.float32)


def _logits_tile(q, k_t, bht_blk, bw_blk, scale, rpt, w_grid):
    """bht_blk arrives TRANSPOSED [rpt, TQ] (the [TQ, rpt] layout would
    need an illegal 16-wide last block dim); contracting its leading dim
    against the expander's leading dim yields [TQ, TK] directly."""
    lt = jax.lax.dot_general(
        q, k_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [TQ, TK]
    lt += jax.lax.dot_general(
        bht_blk.astype(jnp.float32), _expand_h(rpt, w_grid),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    lt += jnp.dot(bw_blk.astype(jnp.float32), _expand_w(rpt, w_grid),
                  preferred_element_type=jnp.float32)
    return lt


def _fwd_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, lse_ref,
                m_acc, den_acc, o_acc, *, scale, w_grid, rpt):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        den_acc[...] = jnp.zeros_like(den_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    lt = _logits_tile(q_ref[0], k_ref[0], bh_ref[0], bw_ref[0], scale,
                      rpt, w_grid)
    m_prev = m_acc[...]
    m_new = jnp.maximum(m_prev, jnp.max(lt, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p_t = jnp.exp(lt - m_new)  # [TQ, TK]
    m_acc[...] = m_new
    den_acc[...] = den_acc[...] * corr + jnp.sum(p_t, axis=1,
                                                 keepdims=True)
    o_acc[...] = o_acc[...] * corr + jnp.dot(
        p_t.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        o_ref[0] = (o_acc[...] / den_acc[...]).astype(o_ref.dtype)
        lse_ref[0] = (
            m_acc[...] + jnp.log(den_acc[...])
        ).astype(lse_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, do_ref, lse_ref,
                delta_ref, dq_ref, dbh_ref, dbw_ref, dk_ref, dv_ref,
                dq_acc, dbw_acc, dk_acc, dv_acc, *, scale, w_grid, rpt,
                tk):
    qi = pl.program_id(1)
    nq = pl.num_programs(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when((qi == 0) & (ki == 0))
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(ki == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        dbw_acc[...] = jnp.zeros_like(dbw_acc)

    q = q_ref[0]
    k_t = k_ref[0]
    lt = _logits_tile(q, k_t, bh_ref[0], bw_ref[0], scale, rpt, w_grid)
    p_t = jnp.exp(lt - lse_ref[0])  # [TQ, TK]

    do = do_ref[0].astype(jnp.float32)  # [TQ, D]
    dp_t = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_t = p_t * (dp_t - delta_ref[0])  # [TQ, TK]

    # dBh per (q-tile, k-tile) block, written transposed [rpt, TQ];
    # dBw accumulates over k tiles
    dbh_ref[0] = jax.lax.dot_general(
        _expand_h(rpt, w_grid), ds_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dbh_ref.dtype)
    dbw_acc[...] += jax.lax.dot_general(
        ds_t, _expand_w(rpt, w_grid), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dq_acc[...] += jnp.dot(ds_t, k_t.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    sl = pl.ds(pl.multiple_of(ki * tk, 8), tk)
    dk_acc[sl, :] += jax.lax.dot_general(
        ds_t, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_acc[sl, :] += jax.lax.dot_general(
        p_t, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)
        dbw_ref[0] = dbw_acc[...].astype(dbw_ref.dtype)

    @pl.when(qi == nq - 1)
    def _():
        # the ki-th dk/dv block completes on the last q pass
        dk_ref[0] = dk_acc[sl, :].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[sl, :].astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attn(q, k, v, bh, bw, scale, h_grid, w_grid, interpret):
    return _attn_fwd(q, k, v, bh, bw, scale, h_grid, w_grid, interpret)[0]


def _attn_fwd(q, k, v, bh, bw, scale, h_grid, w_grid, interpret):
    """q/k/v: [G, N, D] (G = batch*heads); bh: [G, N, h_grid];
    bw: [G, N, w_grid]. Returns [G, N, D]."""
    g, n, d = q.shape
    tq = _q_tile(n)
    tk = _k_tile(n, w_grid)
    rpt = tk // w_grid
    grid = (g, n // tq, n // tk)
    kern = functools.partial(
        _fwd_kernel, scale=scale, w_grid=w_grid, rpt=rpt
    )
    bh_t = jnp.swapaxes(bh, 1, 2)  # [G, h_grid, N]
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, rpt, tq), lambda gi, qi, ki: (gi, ki, qi)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi, ki: (gi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tq, 1), lambda gi, qi, ki: (gi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, d), q.dtype),
            jax.ShapeDtypeStruct((g, n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bh_t, bw)
    return out, (q, k, v, bh_t, bw, out, lse)


def _attn_bwd(scale, h_grid, w_grid, interpret, res, g_out):
    q, k, v, bh_t, bw, out, lse = res
    g, n, d = q.shape
    tq = _q_tile(n)
    tk = _k_tile(n, w_grid, backward=True)
    rpt = tk // w_grid
    grid = (g, n // tq, n // tk)
    # delta = rowsum(dp * p) = rowsum(do * out): tiny XLA precompute
    delta = jnp.sum(
        g_out.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # [G, N, 1]
    kern = functools.partial(
        _bwd_kernel, scale=scale, w_grid=w_grid, rpt=rpt, tk=tk
    )
    dq, dbh, dbw, dk, dv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, rpt, tq), lambda gi, qi, ki: (gi, ki, qi)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tq, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tq, 1), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tq, 1), lambda gi, qi, ki: (gi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, rpt, tq), lambda gi, qi, ki: (gi, ki, qi)),
            pl.BlockSpec((1, tq, w_grid), lambda gi, qi, ki: (gi, qi, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
            pl.BlockSpec((1, tk, d), lambda gi, qi, ki: (gi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, n, d), q.dtype),
            jax.ShapeDtypeStruct((g, h_grid, n), bh_t.dtype),
            jax.ShapeDtypeStruct((g, n, w_grid), bw.dtype),
            jax.ShapeDtypeStruct((g, n, d), k.dtype),
            jax.ShapeDtypeStruct((g, n, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, d), jnp.float32),
            pltpu.VMEM((tq, w_grid), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bh_t, bw, g_out, lse, delta)
    return dq, dk, dv, jnp.swapaxes(dbh, 1, 2), dbw


_attn.defvjp(_attn_fwd, _attn_bwd)


def flash_attention_relpos(q, k, v, bh, bw, scale, h_grid, w_grid,
                           interpret=False):
    """Exact softmax(q k^T * scale + decomposed rel-pos bias) v.

    q/k/v: [G, N, D] with N = h_grid * w_grid (k raster order, x fastest);
    bh: [G, N, h_grid] (bias toward k-row yk); bw: [G, N, w_grid].
    Differentiable in q, k, v, bh, bw.
    """
    n = q.shape[1]
    if not supported_shape(n, w_grid):
        raise ValueError(
            f"flash_attention_relpos: no exact tiling for N={n}, "
            f"w_grid={w_grid} (trailing queries/keys would be dropped); "
            "check supported_shape() and use the XLA path instead"
        )
    return _attn(q, k, v, bh, bw, scale, h_grid, w_grid, interpret)
