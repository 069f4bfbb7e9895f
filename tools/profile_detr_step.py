#!/usr/bin/env python3
"""DETR step decomposition: backbone / encoder / decoder / matcher+criterion
/ full fwd / full train step, in ms on the attached device.

Times the model's staged forwards (models/detr.py ``stage`` arg) with a
synchronizing fetch per iteration and varying inputs (the axon runtime
elides repeated identical computations — see bench.py). Differences give
per-component cost:

    backbone            = t(stage=backbone)
    encoder             = t(stage=encoder) - t(stage=backbone)
    decoder             = t(stage=full)    - t(stage=encoder)
    matcher+criterion   = t(losses | fixed outputs)
    train step          = full fwd+bwd+opt (bench.py flow)

Usage: [BENCH_DTYPE=bfloat16] python tools/profile_detr_step.py
Writes one JSON line per row; also saved to DETR_PROFILE.json.
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


def timed(fn, args_fn, iters=8, warmup=2):
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
    if "BENCH_CANVAS" in os.environ:  # e.g. 800x1344 (protocol scale)
        canvas = tuple(
            int(x) for x in os.environ["BENCH_CANVAS"].split("x"))
    cfg = build_cfg(canvas, bpc, family="detr")
    cfg.freeze()
    det = build_detector(cfg)
    variables = det.init_variables(jax.random.PRNGKey(0))
    h, w = det.canvas
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (bpc, h, w, 3)).astype(np.float32)
    images = jnp.asarray(base)
    sizes = jnp.asarray(np.tile([[h, w]], (bpc, 1)).astype(np.int32))

    def vary(i):
        # nudge one pixel so the runtime cannot dedup identical launches
        return images.at[0, 0, 0, 0].set(float(i)), sizes

    stage_fns = {}
    for stage in ("backbone", "encoder", "full"):
        stage_fns[stage] = jax.jit(
            lambda v, im, sz, s=stage: det.module.apply(
                v, det.preprocess(im), sz, False, stage=s
            )
        )

    rows = {}
    for stage in ("backbone", "encoder", "full"):
        rows[stage] = timed(
            lambda im, sz, s=stage: stage_fns[s](variables, im, sz), vary
        )

    # matcher + criterion on fixed forward outputs
    out = stage_fns["full"](variables, images, sizes)
    out = jax.device_get(out)
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

    from aldi_tpu.models.detr import detr_losses_all_layers

    logits = jnp.asarray(out["logits"])
    pboxes = jnp.asarray(out["boxes"])

    @jax.jit
    def criterion(logits, pboxes, gt):
        gt_n = det._normalize_gt(gt, sizes)
        num_boxes = jnp.maximum(gt.valid.sum().astype(jnp.float32), 1.0)
        ce, l1, giou = detr_losses_all_layers(
            logits, pboxes, gt_n, gt.classes, gt.valid,
            det.num_classes, det.focal_alpha, num_boxes,
        )
        return ce.sum() + l1.sum() + giou.sum()

    rows["criterion"] = timed(
        lambda lg, pb: criterion(lg, pb, gt),
        lambda i: (logits + i * 1e-6, pboxes),
    )

    # full train step (fwd + bwd + opt), the bench.py flow
    from __graft_entry__ import _fake_batch
    from aldi_tpu.engine import create_train_state, make_train_step

    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)
    batch = _fake_batch(bpc, det.canvas, max_gt, True)

    def step_once(i):
        nonlocal state
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        return metrics["total_loss"]

    rows["train_step"] = timed(step_once, lambda i: (i,), iters=6)

    from aldi_tpu.config import compute_dtype
    dt = str(np.dtype(compute_dtype(cfg)))
    result = {
        "config": f"DeformableDETR-R50 {h}x{w} batch {bpc} {dt} {platform}",
        "backbone_ms": round(rows["backbone"], 2),
        "encoder_ms": round(rows["encoder"] - rows["backbone"], 2),
        "decoder_ms": round(rows["full"] - rows["encoder"], 2),
        "criterion_ms": round(rows["criterion"], 2),
        "fwd_total_ms": round(rows["full"], 2),
        "train_step_ms": round(rows["train_step"], 2),
        "train_img_per_s": round(
            2 * bpc / (rows["train_step"] / 1000.0), 2
        ),
    }
    print(json.dumps(result))
    # merge by canvas so the 640x640 and protocol-scale (800x1344)
    # decompositions live side by side in the committed artifact
    path = os.path.join(ROOT, "DETR_PROFILE.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        # legacy format: a single flat profile (640x640)
        merged = old if "by_canvas" in old else {"by_canvas": {"640x640": old}}
    merged.setdefault("by_canvas", {})[f"{h}x{w}"] = result
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
