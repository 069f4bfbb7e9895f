#!/usr/bin/env python3
"""MSDeformAttn roofline at a given canvas: is the encoder layer at its
gather bound?

The quad-table formulation (ops/ms_deform_attn.py) needs exactly ONE
gathered row per (batch, query, head, level, point) sample. On TPU the
flat row gather is row-rate-bound (measured ~0.4G rows/s raw regardless of
row width — ms_deform_attn.py docstring, observation 2), so the layer's
floor is

    t_floor ~= rows_total / row_rate + table_build_bytes / hbm_bw

This tool measures, at the encoder shapes of a canvas (default the
reference DETR protocol scale 800x1344, reference
``configs/Base-DETR.yaml:41-47``):

  1. the RAW gather rate at the exact (rows, 4D) shape of each level —
     an isolated ``jnp.take`` with the same index distribution;
  2. the full ``ms_deform_attn_core`` fwd and fwd+bwd per encoder layer;
  3. the same under a QUERY_CHUNK sweep (the 256 default was tuned at
     640x640 / Lq=8500; protocol scale runs 3x the queries);

and prints one JSON line: measured vs gather-roofline fraction. Run on the
real chip:  python tools/profile_msda_roofline.py  [BENCH_CANVAS=800x1344]
"""

import json
import os
import sys
import time

os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def _shapes_for_canvas(h, w, strides=(8, 16, 32, 64)):
    return [(-(-h // s), -(-w // s)) for s in strides]


def _timed(f, args, iters=10, warmup=2):
    import jax

    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from aldi_tpu.ops import ms_deform_attn as m

    canvas = os.environ.get("BENCH_CANVAS", "800x1344")
    ch, cw = (int(x) for x in canvas.split("x"))
    B, H, D, P, L = 2, 8, 32, 4, 4
    shapes = _shapes_for_canvas(ch, cw)
    lq = sum(hh * ww for hh, ww in shapes)
    rows_per_layer = B * lq * H * L * P
    row_bytes = 4 * D * 2  # bf16 quad rows
    rng = np.random.RandomState(0)

    result = {
        "canvas": f"{ch}x{cw}", "B": B, "Lq": lq,
        "rows_per_layer": rows_per_layer,
        "gather_GB_per_layer": round(rows_per_layer * row_bytes / 1e9, 3),
    }

    # ---- 1. raw gather rate at the finest level's table geometry
    hh, ww = shapes[0]
    n_rows_tbl = B * (hh + 1) * (ww + 1) * H
    n_take = B * lq * H * P  # one level's share of the layer's rows
    table = jnp.asarray(rng.randn(n_rows_tbl, 4 * D), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, n_rows_tbl, n_take), jnp.int32)

    @jax.jit
    def raw_gather(c, table):
        got = jnp.take(table, idx + c * 0, axis=0)
        return got.astype(jnp.float32).sum()

    t_raw = _timed(lambda c: raw_gather(c, table), (jnp.int32(0),))
    row_rate = n_take / (t_raw / 1e3)
    result["raw_gather_ms"] = round(t_raw, 3)
    result["raw_rows_per_s_G"] = round(row_rate / 1e9, 3)
    result["gather_floor_ms_per_layer"] = round(
        rows_per_layer / row_rate * 1e3, 2)

    # ---- 2/3. full encoder-layer core fwd / fwd+bwd, QUERY_CHUNK sweep
    value = jnp.asarray(rng.randn(B, lq, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, lq, H, L, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, lq, H, L, P), jnp.float32)

    def fwd_loss(value, loc):
        out = m.ms_deform_attn_core(value, shapes, loc, w)
        return out.astype(jnp.float32).sum()

    sweep = {}
    default_qc, default_large = m.QUERY_CHUNK, m.LARGE_LQ
    m.LARGE_LQ = 1 << 40  # sweep drives the chunk via QUERY_CHUNK directly
    for qc in (256, 512, 1024, 2048):
        m.QUERY_CHUNK = qc
        f_fwd = jax.jit(lambda c, v: fwd_loss(v, loc + c * 0))
        f_bwd = jax.jit(jax.grad(
            lambda v, c: fwd_loss(v, loc + c * 0)))
        t_f = _timed(lambda c: f_fwd(c, value), (jnp.float32(0),), iters=6)
        t_g = _timed(lambda c: f_bwd(value, c), (jnp.float32(0),), iters=6)
        sweep[str(qc)] = {"fwd_ms": round(t_f, 2),
                          "fwd_bwd_ms": round(t_f + t_g, 2)}
        print(f"QUERY_CHUNK={qc}: fwd {t_f:.1f} ms, grad {t_g:.1f} ms",
              flush=True)
    m.QUERY_CHUNK, m.LARGE_LQ = default_qc, default_large
    result["query_chunk_sweep"] = sweep

    best = min(sweep.values(), key=lambda r: r["fwd_bwd_ms"])
    result["best_fwd_bwd_ms"] = best["fwd_bwd_ms"]
    # fwd+bwd moves ~3x the fwd gather bytes (gather + scatter-add + reread)
    result["gather_roofline_fwd_bwd_ms"] = round(
        3 * result["gather_floor_ms_per_layer"], 2)
    result["roofline_fraction"] = round(
        result["gather_roofline_fwd_bwd_ms"] / best["fwd_bwd_ms"], 3)
    print(json.dumps(result))
    with open(os.path.join(ROOT, "MSDA_ROOFLINE.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
