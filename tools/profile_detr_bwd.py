#!/usr/bin/env python3
"""DETR backward decomposition: fwd vs fwd+bwd per component on device.

Answers "where do the ~1.9 s beyond the 244 ms forward go?" by timing
value_and_grad of (a) the full supervised loss, (b) backbone-only,
(c) backbone+encoder, against their forwards. Measurement rules as in
profile_fine.py: varying inputs + per-call fetch (tunnel runtime dedup).
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


def timed(fn, args_fn, iters=6, warmup=2):
    import jax

    out = None
    for i in range(warmup):
        out = fn(*args_fn(i))
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*args_fn(100 + i))
        jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_cfg
    from aldi_tpu.models import build_detector
    from aldi_tpu.structures import Instances

    platform = jax.devices()[0].platform
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", "2"))
    canvas = (640, 640) if platform != "cpu" else (256, 256)
    cfg = build_cfg(canvas, bpc, family="detr")
    cfg.freeze()
    det = build_detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    h, w = det.canvas
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (bpc, h, w, 3)).astype(np.float32))
    sizes = jnp.asarray(np.tile([[h, w]], (bpc, 1)).astype(np.int32))
    max_gt = cfg.TPU.MAX_GT
    boxes = np.zeros((bpc, max_gt, 4), np.float32)
    boxes[:, :10] = rng.uniform(0, h / 2, (bpc, 10, 4))
    boxes[:, :10, 2:] += h / 4
    valid = np.zeros((bpc, max_gt), bool)
    valid[:, :10] = True
    gt = Instances(
        boxes=jnp.asarray(boxes),
        classes=jnp.asarray(np.zeros((bpc, max_gt), np.int32)),
        valid=jnp.asarray(valid), scores=None,
    )

    def vary(i):
        return (images.at[0, 0, 0, 0].set(float(i)),)

    rows = {}

    # ---- full supervised loss: fwd vs fwd+bwd
    def loss_full(v, im):
        losses, _ = det.forward_train(
            v, im, sizes, gt, jax.random.PRNGKey(0))
        return sum(jnp.sum(l) for l in losses.values())

    lf = jax.jit(loss_full)
    gf = jax.jit(jax.grad(loss_full))
    rows["loss_fwd"] = timed(lambda im: lf(variables, im), vary)
    rows["loss_fwd_bwd"] = timed(lambda im: gf(variables, im), vary)

    # ---- backbone-only fwd vs fwd+bwd (scalarized output)
    def bb_loss(v, im):
        feats = det.module.apply(
            v, det.preprocess(im), sizes, False, stage="backbone")
        return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                   for f in jax.tree.leaves(feats))

    bl = jax.jit(bb_loss)
    bg = jax.jit(jax.grad(bb_loss))
    rows["backbone_fwd"] = timed(lambda im: bl(variables, im), vary)
    rows["backbone_fwd_bwd"] = timed(lambda im: bg(variables, im), vary)

    # ---- backbone+encoder fwd vs fwd+bwd
    def enc_loss(v, im):
        mem = det.module.apply(
            v, det.preprocess(im), sizes, False, stage="encoder")
        return sum(jnp.sum(m.astype(jnp.float32) ** 2)
                   for m in jax.tree.leaves(mem))

    el = jax.jit(enc_loss)
    eg = jax.jit(jax.grad(enc_loss))
    rows["encoder_fwd"] = timed(lambda im: el(variables, im), vary)
    rows["encoder_fwd_bwd"] = timed(lambda im: eg(variables, im), vary)

    result = {
        "config": f"DeformableDETR-R50 {h}x{w} batch {bpc} {platform}",
        **{k: round(v, 2) for k, v in rows.items()},
        "encoder_only_fwd": round(
            rows["encoder_fwd"] - rows["backbone_fwd"], 2),
        "encoder_only_bwd_extra": round(
            (rows["encoder_fwd_bwd"] - rows["backbone_fwd_bwd"])
            - (rows["encoder_fwd"] - rows["backbone_fwd"]), 2),
    }
    print(json.dumps(result))

    # merge the backward decomposition into the committed profile artifact
    prof_path = os.path.join(ROOT, "DETR_PROFILE.json")
    if os.path.exists(prof_path):
        with open(prof_path) as f:
            prof = json.load(f)
        prof["bwd_decomposition"] = result
        with open(prof_path, "w") as f:
            json.dump(prof, f, indent=1)


if __name__ == "__main__":
    main()
