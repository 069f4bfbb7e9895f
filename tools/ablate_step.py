#!/usr/bin/env python3
"""Ablation timing of the FULL jitted DAOD train step.

Isolated op microbenchmarks mislead on this runtime (work overlaps, and the
compiler schedules differently in context), so attribution is measured by
ablation: re-jit the complete step with one component stubbed out and compare
step time against the baseline. Each variant is a fresh XLA compile (cached
in JAX_COMPILATION_CACHE_DIR across runs).

Prints a table of step-ms and the delta vs baseline (= that component's
marginal in-context cost).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _fake_batch
from bench import build_cfg


def time_step(cfg, det, batch, iters=8):
    from aldi_tpu.engine import create_train_state, make_train_step

    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)
    # warmup/compile
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(state.params)
    t0 = time.time()
    pending = []
    for i in range(iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        pending.append(metrics["total_loss"])
        if len(pending) > 2:
            float(pending.pop(0))
    for p in pending:
        float(p)
    return (time.time() - t0) / iters


class patched:
    """Temporarily replace module attributes: patched((mod, name, fn), ...)."""

    def __init__(self, *specs):
        self.specs = specs

    def __enter__(self):
        self.saved = [(m, n, getattr(m, n)) for m, n, _ in self.specs]
        for m, n, f in self.specs:
            setattr(m, n, f)

    def __exit__(self, *exc):
        for m, n, f in self.saved:
            setattr(m, n, f)


def main():
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", "2"))
    cfg = build_cfg((1024, 2048), bpc)
    cfg.freeze()

    import aldi_tpu.engine.train_step as ts_mod
    import aldi_tpu.models.rcnn as rcnn_mod
    import aldi_tpu.models.roi_heads as rh_mod
    import aldi_tpu.models.rpn as rpn_mod
    from aldi_tpu.models import build_detector

    batch = None
    results = {}

    def run(name, *specs, mutate_det=None):
        nonlocal batch
        det = build_detector(cfg)
        if batch is None:
            batch = _fake_batch(bpc, det.canvas, cfg.TPU.MAX_GT, True)
        if mutate_det:
            mutate_det(det)
        with patched(*specs):
            dt = time_step(cfg, det, batch)
        results[name] = dt
        base = results.get("baseline", dt)
        print(f"{name:28s} {dt*1000:8.1f} ms   delta {1000*(dt-base):+8.1f} ms",
              flush=True)

    run("baseline")

    # ---- teacher pass stubbed: same output STRUCTURE (via eval_shape), zeros
    def no_teacher(det):
        real = det.forward_teacher_ctx

        def fake(variables, images, image_sizes, rng, threshold, max_gt):
            # threshold/max_gt must stay static during the shape trace
            shapes = jax.eval_shape(
                lambda v, im, sz, r: real(
                    v, im, sz, r, threshold=threshold, max_gt=max_gt
                ),
                variables, images, image_sizes, rng,
            )
            return jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

        det.forward_teacher_ctx = fake

    run("teacher=0", mutate_det=no_teacher)

    # ---- rpn loss entirely zeroed (matching + sampling + bce/sl1 tail)
    def zero_rpn_losses(key, anchors, logits, deltas, gt_boxes, gt_valid,
                        **kw):
        z = (logits.astype(jnp.float32) * 0).sum()
        return {"loss_rpn_cls": z, "loss_rpn_loc": z}

    run("rpn_losses=0", (rcnn_mod, "rpn_losses", zero_rpn_losses))

    # ---- only the matcher+subsample zeroed (bce/sl1 tail kept)
    def zero_label_anchors(key, anchors, gt_boxes, gt_valid, **kw):
        b, _ = gt_boxes.shape[:2]
        n = anchors.shape[0]
        labels = jnp.zeros((b, n), jnp.int8)
        matched = jnp.zeros((b, n, 4), jnp.float32) + gt_boxes[:, :1]
        return labels, matched

    run("label_anchors=0",
        (rpn_mod, "label_anchors", zero_label_anchors),
        (rcnn_mod, "label_anchors", zero_label_anchors))

    # ---- ROIAlign replaced by zeros (both student streams + teacher heads)
    real_ra = rh_mod.roi_align_batched

    def zero_roi_align(features, boxes, valid, strides, resolution, **kw):
        shapes = jax.eval_shape(
            real_ra, features, boxes, valid, strides, resolution, **kw
        )
        return (boxes.astype(features[0].dtype).sum() * 0) + jnp.zeros(
            shapes.shape, shapes.dtype
        )

    run("roi_align=0", (rh_mod, "roi_align_batched", zero_roi_align))

    # ---- NMS keep-masks forced to all-true (proposal NMS + class NMS)
    def all_keep(boxes, scores, valid, thresh):
        return jnp.ones(scores.shape, bool)

    def all_keep_cls(boxes, scores, classes, valid, thresh):
        return jnp.ones(scores.shape, bool)

    run("nms=passthrough",
        (rpn_mod, "nms_keep_mask", all_keep),
        (rh_mod, "batched_nms_keep_mask", all_keep_cls))

    # ---- device strong augmentation as identity
    run("strong_aug=identity",
        (ts_mod, "strong_augment",
         lambda key, images, sizes, *a, **k: images))

    # ---- proposal sampling (matching 1000 proposals vs gt) stubbed
    real_sp = rh_mod.sample_proposals

    def zero_sample(key, boxes, valid, gt_boxes, gt_classes, gt_valid, **kw):
        shapes = jax.eval_shape(
            real_sp, key, boxes, valid, gt_boxes, gt_classes, gt_valid, **kw
        )
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )

    run("sample_proposals=0",
        (rh_mod, "sample_proposals", zero_sample),
        (rcnn_mod, "sample_proposals", zero_sample))

    print("\nsummary (marginal in-context cost):")
    base = results["baseline"]
    for k, v in results.items():
        if k != "baseline":
            print(f"  {k:28s} {1000*(base-v):8.1f} ms")
    print(f"  {'baseline step':28s} {1000*base:8.1f} ms")


if __name__ == "__main__":
    main()
