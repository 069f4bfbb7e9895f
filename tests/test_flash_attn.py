"""Pallas rel-pos flash attention (interpret mode) vs the XLA math.

The kernel replaces the ViTDet global-attention XLA path
(models/vit.py Attention), which materializes [B, nh, N, N] tensors;
parity target is that exact math: softmax(q k^T * scale + Bh + Bw) v
with the decomposed detectron2-ViTDet rel-pos bias.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pytest

from aldi_tpu.ops.pallas_flash_attn import (
    _k_tile, flash_attention_relpos, supported_shape,
)


def _ref(q, k, v, bh, bw, scale):
    g, n, _ = q.shape
    logits = jnp.einsum("gqd,gkd->gqk", q, k) * scale
    bias = (bh[:, :, :, None] + bw[:, :, None, :]).reshape(g, n, n)
    p = jax.nn.softmax(logits + bias, axis=-1)
    return jnp.einsum("gqk,gkd->gqd", p, v)


def _inputs(seed=0, g=2, hg=16, wg=16, d=64):
    rng = np.random.RandomState(seed)
    n = hg * wg
    q = jnp.asarray(rng.randn(g, n, d) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(g, n, d) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(g, n, d), jnp.float32)
    bh = jnp.asarray(rng.randn(g, n, hg) * 0.2, jnp.float32)
    bw = jnp.asarray(rng.randn(g, n, wg) * 0.2, jnp.float32)
    return q, k, v, bh, bw


def test_flash_relpos_forward_matches_xla():
    q, k, v, bh, bw = _inputs()
    hg = bh.shape[-1]
    wg = bw.shape[-1]
    scale = q.shape[-1] ** -0.5
    want = _ref(q, k, v, bh, bw, scale)
    got = flash_attention_relpos(q, k, v, bh, bw, scale, hg, wg,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_relpos_grads_match_xla():
    q, k, v, bh, bw = _inputs(seed=3)
    hg = bh.shape[-1]
    wg = bw.shape[-1]
    scale = q.shape[-1] ** -0.5
    co = jnp.asarray(
        np.random.RandomState(7).randn(*q.shape), jnp.float32
    )

    g_ref = jax.grad(lambda a: (_ref(*a, scale) * co).sum())(
        (q, k, v, bh, bw)
    )
    g_got = jax.grad(
        lambda a: (
            flash_attention_relpos(*a, scale, hg, wg, interpret=True) * co
        ).sum()
    )((q, k, v, bh, bw))
    for name, a, b in zip("q k v bh bw".split(), g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_flash_relpos_ktiled_backward():
    # N=4096 > 2048 engages the k-tiled backward (4 tiles of 1024)
    q, k, v, bh, bw = _inputs(seed=9, g=1, hg=64, wg=64)
    scale = q.shape[-1] ** -0.5
    co = jnp.asarray(
        np.random.RandomState(2).randn(*q.shape).astype(np.float32) * 0.01
    )
    g_ref = jax.grad(lambda a: (_ref(*a, scale) * co).sum())(
        (q, k, v, bh, bw)
    )
    g_got = jax.grad(
        lambda a: (
            flash_attention_relpos(*a, scale, 64, 64, interpret=True) * co
        ).sum()
    )((q, k, v, bh, bw))
    for name, a, b in zip("q k v bh bw".split(), g_ref, g_got):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"d{name}",
        )


def test_supported_shape_gates_inexact_tilings():
    # 50x84 (canvas 800x1344): N=4200 is not a multiple of tq=256 —
    # the kernel would leave trailing query blocks uninitialized
    assert not supported_shape(50 * 84, 84)
    # flagship/benchmark grids stay supported
    assert supported_shape(64 * 64, 64)
    assert supported_shape(64 * 128, 128)
    assert supported_shape(16 * 16, 16)
    # 64x96: N=6144; old fallback returned tk=N=6144 on the backward,
    # overflowing scoped VMEM — now an exact sub-tiling must exist or
    # the shape is rejected outright
    tk_bwd = _k_tile(64 * 96, 96, backward=True)
    assert tk_bwd is None or (6144 % tk_bwd == 0 and tk_bwd <= 2048)
    if not supported_shape(64 * 96, 96):
        with pytest.raises(ValueError):
            q, k, v, bh, bw = _inputs(seed=1, g=1, hg=64, wg=96)
            flash_attention_relpos(q, k, v, bh, bw, 0.125, 64, 96,
                                   interpret=True)


def test_k_tile_exact_or_none():
    for hg, wg in [(64, 64), (64, 128), (32, 96), (80, 100), (50, 84)]:
        n = hg * wg
        for backward in (False, True):
            tk = _k_tile(n, wg, backward=backward)
            if tk is None:
                continue
            assert n % tk == 0
            assert tk % wg == 0 or tk == n
            if n > (2048 if backward else 4096):
                assert tk <= (2048 if backward else 4096)


def test_flash_relpos_nonsquare_grid():
    # h_grid != w_grid exercises the interleave-vs-tile bias expanders
    q, k, v, bh, bw = _inputs(seed=5, hg=8, wg=32)
    scale = q.shape[-1] ** -0.5
    want = _ref(q, k, v, bh, bw, scale)
    got = flash_attention_relpos(q, k, v, bh, bw, scale, 8, 32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
