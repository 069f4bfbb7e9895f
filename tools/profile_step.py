#!/usr/bin/env python3
"""Decompose ALDI++ train-step time on the current device: teacher pass,
student grad pass, NMS-ablated variants. Guides kernel optimization."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _fake_batch
from bench import build_cfg
from aldi_tpu.engine import create_train_state, make_train_step
from aldi_tpu.models import build_detector
from aldi_tpu.structures import Instances


def timeit(fn, *args, iters=8, warmup=2, name=""):
    for i in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt * 1000:9.1f} ms")
    return dt


def main():
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", "2"))
    canvas = (1024, 2048)
    cfg = build_cfg(canvas, bpc)
    cfg.freeze()
    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    batch = _fake_batch(bpc, det.canvas, cfg.TPU.MAX_GT, True)
    lab, unlab = batch["labeled"], batch["unlabeled"]
    gt = Instances(boxes=lab["boxes"], classes=lab["classes"],
                   valid=lab["valid"], scores=None)
    variables = {"params": state.params, "frozen": state.frozen}
    key = jax.random.PRNGKey(1)

    # 1. backbone fwd only
    f_bb = jax.jit(lambda v, im: det.backbone(v, det.preprocess(im)))
    timeit(f_bb, variables, lab["image"], name="backbone fwd")

    # 2. backbone + rpn + proposal generation (incl. NMS)
    def g(v, im, sz):
        feats = det.backbone(v, det.preprocess(im))
        lg, dl = det.rpn_head(v, feats)
        return det.proposals(lg, dl, sz, True)

    timeit(jax.jit(g), variables, lab["image"], lab["sizes"],
           name="+rpn+proposals(NMS train topk)")

    # 3. full teacher ctx (inference NMS + class-aware NMS)
    f_t = jax.jit(
        lambda v, im, sz, r: det.forward_teacher_ctx(
            v, im, sz, r, threshold=0.8, max_gt=cfg.TPU.MAX_GT
        )
    )
    timeit(f_t, variables, unlab["image"], unlab["sizes"], key,
           name="teacher ctx (pseudo-labels)")

    # 4. student forward+grad (supervised only)
    def loss_fn(p, im, sz, g_, r):
        losses, _ = det.forward_train(
            {"params": p, "frozen": state.frozen}, im, sz, g_, r
        )
        return sum(jnp.asarray(v, jnp.float32) for v in losses.values())

    f_s = jax.jit(jax.grad(loss_fn))
    timeit(f_s, state.params, lab["image"], lab["sizes"], gt, key,
           name="student fwd+bwd (1 stream)")

    # 5. full DAOD step (state is donated -> rebind each call)
    step_fn = make_train_step(cfg, det, tx)
    holder = {"s": state}

    def full():
        s, m = step_fn(holder["s"], batch, key)
        holder["s"] = s
        return m["total_loss"]

    timeit(full, iters=6, name="FULL daod step")


if __name__ == "__main__":
    main()
