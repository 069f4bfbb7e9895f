#!/usr/bin/env python3
"""Fine-grained op-level timing for the R-CNN hot path on device."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _fake_batch
from bench import build_cfg
from aldi_tpu.engine import create_train_state
from aldi_tpu.models import build_detector
from aldi_tpu.models.roi_heads import fast_rcnn_inference, sample_proposals
from aldi_tpu.ops.roi_align import roi_align_batched
from aldi_tpu.structures import Instances


def timeit(fn, *args, iters=8, warmup=2, name=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt * 1000:9.1f} ms", flush=True)
    return dt


def main():
    bpc = 2
    cfg = build_cfg((1024, 2048), bpc)
    cfg.freeze()
    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))
    batch = _fake_batch(bpc, det.canvas, cfg.TPU.MAX_GT, True)
    lab = batch["labeled"]
    gt = Instances(boxes=lab["boxes"], classes=lab["classes"],
                   valid=lab["valid"], scores=None)
    variables = {"params": state.params, "frozen": state.frozen}
    key = jax.random.PRNGKey(1)

    feats = jax.jit(lambda v, im: det.backbone(v, det.preprocess(im)))(
        variables, lab["image"]
    )
    feats = jax.block_until_ready(feats)
    rng = jax.random.PRNGKey(2)
    boxes1000 = jax.random.uniform(
        rng, (bpc, 1000, 4), minval=0, maxval=900
    )
    boxes1000 = boxes1000.at[..., 2:].add(boxes1000[..., :2] * 0 + 64)
    valid1000 = jnp.ones((bpc, 1000), bool)
    boxes512 = boxes1000[:, :512]
    valid512 = valid1000[:, :512]

    # 1. ROIAlign forward (512 train proposals)
    f_ra = jax.jit(
        lambda fs, b, v: roi_align_batched(fs[:-1], b, v, det.roi_strides, 7)
    )
    timeit(f_ra, feats, boxes512, valid512, name="ROIAlign fwd 512")

    # 2. ROIAlign fwd+bwd (grad wrt features)
    def ra_loss(fs, b, v):
        return roi_align_batched(fs[:-1], b, v, det.roi_strides, 7).sum()

    timeit(jax.jit(jax.grad(ra_loss)), feats, boxes512, valid512,
           name="ROIAlign fwd+bwd 512")

    # 3. box head fwd on 1000 proposals (teacher inference path)
    f_bh = jax.jit(lambda v, fs, b, vv: det.box_head(v, fs, b, vv))
    timeit(f_bh, variables, feats, boxes1000, valid1000,
           name="box head fwd 1000 (pool+fc)")

    # 4. fast_rcnn_inference (class-aware NMS)
    cls_logits = jax.random.normal(rng, (bpc, 1000, det.num_classes + 1))
    deltas = jax.random.normal(rng, (bpc, 1000, det.num_classes * 4)) * 0.1
    f_inf = jax.jit(
        lambda b, v, c, d, s: fast_rcnn_inference(
            b, v, c, d, s, det.num_classes
        )
    )
    timeit(f_inf, boxes1000, valid1000, cls_logits, deltas, lab["sizes"],
           name="fast_rcnn_inference (cls NMS)")

    # 5. proposal sampling (matching + subsample)
    f_sp = jax.jit(
        lambda k, b, v, gb, gc, gv: sample_proposals(
            k, b, v, gb, gc, gv, det.num_classes
        )
    )
    timeit(f_sp, key, boxes1000, valid1000, gt.boxes, gt.classes, gt.valid,
           name="sample_proposals")

    # 6. RPN losses (anchor matching over 765k anchors)
    from aldi_tpu.models.rpn import rpn_losses

    logits = jax.random.normal(rng, (bpc, det.anchors_cat.shape[0]))
    dl = jax.random.normal(
        rng, (bpc, det.anchors_cat.shape[0], 4)) * 0.1
    f_rl = jax.jit(
        lambda k, lg, d, gb, gv: rpn_losses(
            k, det.anchors_cat, lg, d, gb, gv
        )
    )
    timeit(f_rl, key, logits, dl, gt.boxes, gt.valid, name="rpn_losses")

    # 7. strong augmentation
    from aldi_tpu.data.strong_aug import strong_augment

    f_sa = jax.jit(
        lambda k, im, sz: strong_augment(k, im, sz, True, True)
    )
    timeit(f_sa, key, lab["image"], lab["sizes"], name="strong_augment")

    # 8. EMA + optimizer-ish tree op
    from aldi_tpu.engine.ema import ema_update

    f_ema = jax.jit(
        lambda e, p: ema_update(e, p, 0.9996, jnp.asarray(5), 0)
    )
    timeit(f_ema, state.params, state.params, name="ema blend")


if __name__ == "__main__":
    main()
