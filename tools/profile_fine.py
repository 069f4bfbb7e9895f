#!/usr/bin/env python3
"""Fine-grained op-level timing for the R-CNN hot path on device.

Measurement rules for the tunnel runtime (it dedupes repeated identical
executions and elides unfetched work):
  - every timed call takes a fresh seed scalar and derives its inputs
    INSIDE the jitted program (no eager per-iteration ops, no dedup);
  - the op runs `INNER` times per call under a lax.scan whose carry chains
    a scalar reduction of each output (serialized, nothing elided);
  - the scalar result is fetched every call.
Reported time = wall / (calls * INNER).
"""

import os
import time

os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

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

RESULTS = {}
INNER = 4


def timeit(op, name, calls=4, inner=INNER):
    """op(key) -> pytree; key derived in-jit from the seed argument."""

    def one(carry, s):
        out = op(jax.random.fold_in(jax.random.PRNGKey(0), s))
        red = sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out)
        )
        return carry + red, None

    @jax.jit
    def run(seed):
        tot, _ = jax.lax.scan(
            one, jnp.float32(0.0), seed * inner + jnp.arange(inner)
        )
        return tot

    float(run(jnp.int32(999)))  # compile + warm
    t0 = time.time()
    for c in range(calls):
        r = run(jnp.int32(c))
    float(r)
    dt = (time.time() - t0) / (calls * inner)
    print(f"{name:44s} {dt * 1000:9.1f} ms", flush=True)
    RESULTS[name] = dt * 1000
    return dt


def main():
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", "2"))
    cfg = build_cfg((1024, 2048), bpc)
    cfg.freeze()
    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))
    batch = _fake_batch(bpc, det.canvas, cfg.TPU.MAX_GT, True)
    lab = batch["labeled"]
    gt = Instances(boxes=lab["boxes"], classes=lab["classes"],
                   valid=lab["valid"], scores=None)
    variables = {"params": state.params, "frozen": state.frozen}
    sizes = lab["sizes"]
    print(f"anchors: {det.anchors_cat.shape[0]}", flush=True)

    def images(k):
        return lab["image"] + jax.random.uniform(k, (1,)) * 1e-3

    # 0. backbone forward / forward+backward
    timeit(lambda k: det.backbone(variables, det.preprocess(images(k))),
           "backbone+FPN fwd", inner=2)

    def bb_loss(v, im):
        feats = det.backbone(v, det.preprocess(im), train=True)
        return sum(f.astype(jnp.float32).mean() for f in feats)

    timeit(lambda k: jax.grad(bb_loss, argnums=0)(variables, images(k)),
           "backbone+FPN fwd+bwd", inner=2)

    feats = jax.jit(
        lambda v, im: det.backbone(v, det.preprocess(im))
    )(variables, lab["image"])
    feats = jax.block_until_ready(feats)

    def feats_v(k):
        d = jax.random.uniform(k, (1,), feats[0].dtype) * 1e-3
        return [f + d for f in feats]

    # 0b. rpn head fwd
    timeit(lambda k: det.rpn_head(variables, feats_v(k)), "rpn head fwd")

    logits, deltas = jax.jit(lambda v, fs: det.rpn_head(v, fs))(
        variables, feats
    )

    # 0c. proposal generation (per-level topk + NMS + global topk)
    def props(k, train):
        lg = [l + jax.random.uniform(k, (1,)) * 1e-3 for l in logits]
        return det.proposals(lg, deltas, sizes, train)

    timeit(lambda k: props(k, True), "generate_proposals train")
    timeit(lambda k: props(k, False), "generate_proposals test")

    def rand_boxes(k, n):
        b = jax.random.uniform(k, (bpc, n, 4), minval=0, maxval=900)
        return b.at[..., 2:].add(64)

    valid1000 = jnp.ones((bpc, 1000), bool)
    valid512 = valid1000[:, :512]

    # 1. ROIAlign forward variants (512 train proposals)
    for mode in ("corner_gather", "pallas", "slice2x2", "fused"):
        timeit(
            lambda k, m=mode: roi_align_batched(
                feats[:-1], rand_boxes(k, 512), valid512, det.roi_strides,
                7, mode=m),
            f"ROIAlign fwd 512 ({mode})",
        )

    # 2. ROIAlign fwd+bwd (grad wrt features)
    for mode in ("corner_gather", "pallas_fused", "fused"):
        def ra_loss(fs, b, m=mode):
            return roi_align_batched(
                fs[:-1], b, valid512, det.roi_strides, 7, mode=m
            ).astype(jnp.float32).sum()

        timeit(
            lambda k, m=mode: jax.grad(ra_loss)(feats, rand_boxes(k, 512), m),
            f"ROIAlign fwd+bwd 512 ({mode})",
        )

    # 3. box head fwd on 1000 proposals (teacher inference path)
    timeit(lambda k: det.box_head(
        variables, feats, rand_boxes(k, 1000), valid1000),
        "box head fwd 1000 (pool+fc)")

    # 4. fast_rcnn_inference (class-aware NMS)
    def inf(k):
        cls_logits = jax.random.normal(
            k, (bpc, 1000, det.num_classes + 1))
        dl = jax.random.normal(k, (bpc, 1000, det.num_classes * 4)) * 0.1
        return fast_rcnn_inference(
            rand_boxes(k, 1000), valid1000, cls_logits, dl, sizes,
            det.num_classes)

    timeit(inf, "fast_rcnn_inference (cls NMS)")

    # 5. proposal sampling (matching + subsample)
    timeit(lambda k: sample_proposals(
        k, rand_boxes(k, 1000), valid1000, gt.boxes, gt.classes, gt.valid,
        det.num_classes), "sample_proposals")

    # 6. RPN losses (anchor matching + sampled loss)
    from aldi_tpu.models.rpn import label_anchors_sampled, rpn_losses

    R = det.anchors_cat.shape[0]

    def rpn_io(k):
        lg = jax.random.normal(k, (bpc, R))
        dl = jnp.zeros((bpc, R, 4)) + jax.random.uniform(k, (1,)) * 0.1
        return lg, dl

    def rpn_run(k):
        lg, dl = rpn_io(k)
        return rpn_losses(k, det.anchors_cat, lg, dl, gt.boxes, gt.valid)

    timeit(rpn_run, "rpn_losses (sampled)")

    def rpn_grad(k):
        lg, dl = rpn_io(k)

        def f(lg, dl):
            o = rpn_losses(k, det.anchors_cat, lg, dl, gt.boxes, gt.valid)
            return o["loss_rpn_cls"] + o["loss_rpn_loc"]

        return jax.grad(f, argnums=(0, 1))(lg, dl)

    timeit(rpn_grad, "rpn_losses grad")

    timeit(lambda k: label_anchors_sampled(
        k, det.anchors_cat, gt.boxes, gt.valid),
        "label_anchors_sampled")

    # 7. strong augmentation
    from aldi_tpu.data.strong_aug import strong_augment

    timeit(lambda k: strong_augment(k, images(k), lab["sizes"], True, True),
           "strong_augment")

    # 8. EMA blend
    from aldi_tpu.engine.ema import ema_update

    timeit(lambda k: ema_update(
        state.ema_params, state.params, 0.9996,
        jax.random.randint(k, (), 5, 10), 0),
        "ema blend")

    print("\nsummary (ms, sorted):")
    for k, v in sorted(RESULTS.items(), key=lambda kv: -kv[1]):
        print(f"  {k:44s} {v:9.1f}")


if __name__ == "__main__":
    main()
