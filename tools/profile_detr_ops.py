#!/usr/bin/env python3
"""Time the MSDeformAttn core on device.

Encoder-layer shapes for the Base-DETR config (640x640, strides 8..64).
Timing uses the carry-chain + single-fetch protocol (the axon tunnel
elides unfetched work and dedups identical dispatches).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from aldi_tpu.ops.ms_deform_attn import ms_deform_attn_core


def main():
    B, H, D, P = 2, 8, 32, 4
    shapes = [(80, 80), (40, 40), (20, 20), (10, 10)]
    lv = sum(h * w for h, w in shapes)
    lq = lv  # encoder self-attention
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, lv, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, lq, H, 4, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, lq, H, 4, P), jnp.float32)

    @jax.jit
    def f(carry, value):
        out = ms_deform_attn_core(value, shapes, loc + carry * 0, w)
        return out.astype(jnp.float32).sum()

    r = f(jnp.float32(0), value)
    r.block_until_ready()
    n = 20
    r = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(r, value)
    float(r)
    print(
        "quad-table encoder-layer (B=%d, Lq=%d): %.3f ms"
        % (B, lq, (time.perf_counter() - t0) / n * 1e3),
        flush=True,
    )


if __name__ == "__main__":
    main()
