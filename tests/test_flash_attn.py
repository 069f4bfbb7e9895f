"""Pallas rel-pos flash attention (interpret mode) vs the XLA math.

The kernel replaces the ViTDet global-attention XLA path
(models/vit.py Attention), which materializes [B, nh, N, N] tensors;
parity target is that exact math: softmax(q k^T * scale + Bh + Bw) v
with the decomposed detectron2-ViTDet rel-pos bias.
"""

import numpy as np
import jax
import jax.numpy as jnp

from aldi_tpu.ops.pallas_flash_attn import flash_attention_relpos


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


def test_flash_relpos_nonsquare_grid():
    # h_grid != w_grid exercises the interleave-vs-tile bias expanders
    q, k, v, bh, bw = _inputs(seed=5, hg=8, wg=32)
    scale = q.shape[-1] ** -0.5
    want = _ref(q, k, v, bh, bw, scale)
    got = flash_attention_relpos(q, k, v, bh, bw, scale, 8, 32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
