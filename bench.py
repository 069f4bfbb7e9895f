#!/usr/bin/env python3
"""Benchmark: ALDI++ DAOD train-step throughput on the available device.

Default (driver contract): runs the flagship configuration's full jitted
iteration — student forwards on labeled-strong + unlabeled-strong streams,
EMA teacher pseudo-labeling, soft distillation, backward, SGD update, with
device-side strong augmentation — on synthetic Cityscapes-shaped data
(1024x2048 canvas, the reference benchmark resolution) and reports
images/sec/chip as ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Per-family rows (VERDICT round-1 item 7): set ``BENCH_FAMILY`` to one of
rcnn (default) / vitdet / convnext / yolo / detr to bench that family's DAOD
step instead, and ``BENCH_MODE=teacher`` to time only the teacher
pseudo-label inference pass (the "teacher step latency" figure);
``BENCH_MODE=infer`` times the serving path (student forward + NMS
postprocess at TEST settings).
``tools/bench_all.py`` sweeps these and writes BENCH_FAMILIES.json.

Baseline context (BASELINE.md): the reference trains ALDI++ on 8x V100 with
global batch 48 (24 labeled + 24 unlabeled per iter); its A100 throughput is
not published. vs_baseline is computed against an assumed 5.0 img/s/chip for
the reference's 5-forward-pass DDP step on A100 — a generous estimate, to be
replaced when a measured reference number exists.
"""

import json
import os
import time

# persistent compile cache: repeated bench runs skip the ~20 min XLA compile
# (pre-create the dir: the cache silently stays disabled if it is missing)
os.makedirs("/tmp/jax_cache", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import numpy as np

ASSUMED_BASELINE_IMG_PER_S_PER_CHIP = 5.0


def build_cfg(canvas, batch_per_chip, family="rcnn"):
    from aldi_tpu.config import get_cfg

    cfg = get_cfg()
    if family in ("rcnn", "vitdet", "convnext"):
        # flagship: Faster R-CNN R50-FPN, ALDI++ recipe
        # (configs/cityscapes/ALDI-Best-Cityscapes.yaml hyperparameters)
        cfg.MODEL.RESNETS.DEPTH = 50
        # one size group per FPN level (3 anchors/cell), as the reference's
        # configs/detectron2/Base-RCNN-FPN.yaml:9-16 — the config default
        # [[32..512]] broadcasts ALL 5 sizes to every level (15 anchors/cell,
        # 2.6M anchors at this canvas: a 5x heavier RPN than the flagship)
        cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
        cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
        cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
        cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 2000
        cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 1000
        cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
        cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
        if family == "vitdet":
            # configs/Base-RCNN-VitDetB.yaml
            cfg.MODEL.BACKBONE.NAME = "build_vitdet_b_backbone"
            cfg.MODEL.ROI_BOX_HEAD.NORM = "LN"
            cfg.MODEL.ROI_BOX_HEAD.NUM_CONV = 4
            cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
            cfg.MODEL.RPN.CONV_DIMS = (-1, -1)
            cfg.SOLVER.OPTIMIZER = "ADAMW"
            cfg.SOLVER.BASE_LR = 1e-4
        elif family == "convnext":
            cfg.MODEL.BACKBONE.NAME = "build_convnext_fpn_backbone"
            cfg.SOLVER.OPTIMIZER = "ADAMW"
            cfg.SOLVER.BASE_LR = 1e-4
    elif family == "yolo":
        # configs/Base-Yolo.yaml (yolov5m)
        cfg.MODEL.META_ARCHITECTURE = "Yolo"
        cfg.MODEL.YAML = "yolov5://yolov5m.yaml"
        cfg.MODEL.YOLO.NUM_CLASSES = 8
        cfg.MODEL.PIXEL_MEAN = [0.0, 0.0, 0.0]
        cfg.MODEL.PIXEL_STD = [255.0, 255.0, 255.0]
    elif family == "detr":
        # configs/Base-DETR.yaml (Deformable DETR R50)
        cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
        cfg.MODEL.DEFORMABLE_DETR.NUM_CLASSES = 8
        cfg.SOLVER.OPTIMIZER = "ADAMW"
        cfg.SOLVER.BASE_LR = 1e-4
    else:
        raise ValueError(f"unknown BENCH_FAMILY {family}")

    # bf16 compute everywhere, DETR included: the reference disables AMP
    # for DETR only because its CUDA MSDeformAttn extension is f32-only
    # (reference README.md:69-74); ours is bf16-safe, and the Hungarian
    # matcher cost math is pinned to f32 inside hungarian_match
    # regardless of trunk dtype.
    cfg.SOLVER.AMP.ENABLED = True
    cfg.SOLVER.IMS_PER_BATCH = batch_per_chip * 2
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong", "unlabeled_strong")
    cfg.DATASETS.BATCH_RATIOS = (1, 1)
    cfg.DATASETS.UNLABELED = ("placeholder",)
    cfg.EMA.ENABLED = True
    cfg.DOMAIN_ADAPT.TEACHER.ENABLED = True
    if family == "detr":
        # HardDistiller semantics (reference Base-DETR recipe)
        cfg.DOMAIN_ADAPT.DISTILL.HARD_ROIH_CLS_ENABLED = True
        cfg.DOMAIN_ADAPT.DISTILL.HARD_ROIH_REG_ENABLED = True
    else:
        cfg.DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED = True
        cfg.DOMAIN_ADAPT.DISTILL.ROIH_REG_ENABLED = True
        cfg.DOMAIN_ADAPT.DISTILL.OBJ_ENABLED = True
        cfg.DOMAIN_ADAPT.DISTILL.RPN_REG_ENABLED = True
    cfg.AUG.UNLABELED_MIC_AUG = True
    cfg.TPU.CANVAS = canvas
    cfg.TPU.MAX_GT = 100
    # perf A/B knobs (see config/defaults.py TPU block)
    cfg.TPU.EVAL_POOL_MODE = os.environ.get(
        "BENCH_EVAL_POOL", cfg.TPU.EVAL_POOL_MODE
    )
    cfg.TPU.POOL_MODE = os.environ.get("BENCH_POOL", cfg.TPU.POOL_MODE)
    cfg.TPU.RPN_LOSS_IMPL = os.environ.get(
        "BENCH_RPN_IMPL", cfg.TPU.RPN_LOSS_IMPL
    )
    if "BENCH_DTYPE" in os.environ:  # e.g. bfloat16 for the DETR trunk
        cfg.TPU.COMPUTE_DTYPE = os.environ["BENCH_DTYPE"]
    if "BENCH_BACKWARD_AT_END" in os.environ:
        # "0": stream-sequential backward (one stream's activations live at
        # a time — the reference BACKWARD_AT_END=False memory recipe that
        # lets ViTDet-B DAOD fit 16 GB at the full 1024x2048 canvas)
        cfg.SOLVER.BACKWARD_AT_END = (
            os.environ["BENCH_BACKWARD_AT_END"] != "0"
        )
    return cfg


def bench_loader():
    """Host-pipeline throughput: JPEG decode + multiscale resize + flip +
    pad at Cityscapes image sizes (2048x1024) through the production
    StreamLoader (C++ aldi_native core when built, PIL otherwise). The
    number to clear: sustained records/s >= train img/s/chip x chips, so
    the host never gates the device step."""
    import tempfile

    from PIL import Image

    from aldi_tpu.config import get_cfg
    from aldi_tpu.data.loader import StreamLoader

    try:
        import aldi_native  # noqa: F401
        native = True
    except ImportError:
        native = False

    tmp = tempfile.mkdtemp(prefix="aldi_loader_bench_")
    rng = np.random.default_rng(0)
    records = []
    for i in range(24):
        # low-frequency content upsampled: JPEG entropy comparable to
        # street scenes (pure noise decodes unrealistically slowly)
        small = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        img = Image.fromarray(small).resize((2048, 1024), Image.BILINEAR)
        fn = os.path.join(tmp, f"{i}.jpg")
        img.save(fn, quality=90)
        records.append({
            "file_name": fn,
            "image_id": i,
            "annotations": [
                {"bbox": [50.0 + 20 * j, 40.0 + 10 * j, 180.0, 140.0],
                 "category_id": j % 8, "iscrowd": 0, "area": 180.0 * 140.0}
                for j in range(12)
            ],
        })

    cfg = get_cfg()
    cfg.TPU.CANVAS = (1024, 2048)
    threads = int(os.environ.get("BENCH_LOADER_THREADS",
                                 cfg.TPU.DATA_THREADS))
    batch = int(os.environ.get("BENCH_LOADER_BATCH", "8"))
    # time a COLD loader end to end: a warm-up phase lets the pool build a
    # prefetch backlog that the timed window then drains for free, wildly
    # overstating sustained throughput (observed 15x on 1 core). Cold
    # timing undercounts only the thread-pool spin-up (~us).
    next(StreamLoader(records[:1], 1, cfg, cfg.TPU.CANVAS, is_train=True,
                      seed=0, num_threads=1, prefetch=0))  # page cache
    n_batches = int(os.environ.get("BENCH_ITERS", "30"))
    loader = StreamLoader(records, batch, cfg, cfg.TPU.CANVAS,
                          is_train=True, seed=0, num_threads=threads,
                          prefetch=threads)
    t0 = time.time()
    for _ in range(n_batches):
        next(loader)
    dt = time.time() - t0
    rec_per_s = n_batches * batch / dt
    print(json.dumps({
        "metric": (
            f"host loader records/s (2048x1024 JPEG decode+resize+pad, "
            f"{threads} threads, native={native})"
        ),
        "value": round(rec_per_s, 2),
        "unit": "records/s",
        "vs_baseline": None,
    }))


def main():
    import jax

    if os.environ.get("BENCH_MODE") == "loader":
        bench_loader()
        return

    # PRNG impl knob; measured on v5e: threefry 6.93 img/s vs rbg 6.45, so
    # the default stays threefry
    if os.environ.get("BENCH_PRNG", "threefry") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    family = os.environ.get("BENCH_FAMILY", "rcnn")
    mode = os.environ.get("BENCH_MODE", "train")

    n_chips = len(jax.devices())
    platform = jax.devices()[0].platform
    # per-chip stream batch (labeled == unlabeled), reference trains 3+3 per
    # V100; start conservative for v5e HBM and let env override
    # per-family canvas + per-chip batch tuned to v5e HBM (16 GB):
    # rcnn/convnext/yolo at the Cityscapes benchmark resolution; ViTDet at
    # the detectron2-ViTDet square recipe resolution (full 1024x2048 ViT-B
    # DAOD does not fit 16 GB at batch 1); DETR at its MIN_SIZE_TRAIN
    # midpoint (reference Base-DETR.yaml:42).
    # rcnn fits batch 4/chip at 1024x2048 (batch 5 exceeds HBM by ~21 MB);
    # 4 amortizes the fixed per-step work ~3% better than 2
    default_bpc = {"rcnn": "4", "vitdet": "1", "convnext": "2",
                   "yolo": "2", "detr": "2"}[family]
    bpc = int(os.environ.get("BENCH_BATCH_PER_CHIP", default_bpc))
    canvas = {"vitdet": (1024, 1024), "detr": (640, 640)}.get(
        family, (1024, 2048)
    )
    if "BENCH_CANVAS" in os.environ:  # e.g. "1024x2048"
        canvas = tuple(int(x) for x in os.environ["BENCH_CANVAS"].split("x"))
    if platform == "cpu":  # driver smoke on CPU: shrink
        canvas, bpc = ((256, 512) if family != "detr" else (256, 256)), 1

    cfg = build_cfg(canvas, bpc * n_chips, family)
    cfg.freeze()

    from __graft_entry__ import _fake_batch
    from aldi_tpu.engine import create_train_state, make_train_step
    from aldi_tpu.models import build_detector
    from aldi_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_state,
    )

    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))

    mesh = None
    if n_chips > 1:
        # BENCH_MESH_MODEL=m: (n/m data) x (m model) mesh with Megatron TP
        # shardings (parallel/mesh.py) instead of pure DP
        n_model = int(os.environ.get("BENCH_MESH_MODEL", "1"))
        mesh = make_mesh(n_chips, model_parallel=n_model)
        state = shard_state(state, mesh)

    batch = _fake_batch(bpc * n_chips, det.canvas, cfg.TPU.MAX_GT, True)
    if mesh is not None:
        batch = shard_batch(batch, mesh)

    if mode == "teacher":
        # teacher pseudo-label inference latency (the pass that gates each
        # DAOD iteration; reference runs it under no_grad on the EMA model)
        thr = cfg.DOMAIN_ADAPT.TEACHER.THRESHOLD

        @jax.jit
        def teacher_fn(state, images, sizes, rng):
            tvars = {"params": state.ema_params, "frozen": state.frozen,
                     **(state.ema_model_state or {})}
            return det.forward_teacher_ctx(
                tvars, images, sizes, rng, threshold=thr,
                max_gt=cfg.TPU.MAX_GT,
            )[1]

        uw = batch["unlabeled"]
        for i in range(3):
            out = teacher_fn(state, uw["image"], uw["sizes"],
                             jax.random.PRNGKey(i))
        jax.block_until_ready(out)
        iters = int(os.environ.get("BENCH_ITERS", "10"))
        t0 = time.time()
        for i in range(iters):
            out = teacher_fn(state, uw["image"], uw["sizes"],
                             jax.random.PRNGKey(100 + i))
            jax.block_until_ready(out.valid)
        dt = (time.time() - t0) / iters
        result = {
            "metric": f"teacher pseudo-label latency ({family}, "
            f"{canvas[0]}x{canvas[1]}, batch {bpc * n_chips}, {platform})",
            "value": round(dt * 1000, 2),
            "unit": "ms",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        return

    if mode == "infer":
        # serving path: student forward + per-image postprocess (score
        # threshold, class-aware NMS, top-k) at TEST settings — the flow
        # tools/train_net.py --eval-only drives per batch
        @jax.jit
        def infer_fn(state, images, sizes):
            svars = {"params": state.params, "frozen": state.frozen,
                     **(state.model_state or {})}
            return det.forward_inference(svars, images, sizes)

        lw = batch["labeled"]
        out = None
        for i in range(3):
            # vary inputs: the tunnel runtime dedups repeated identical
            # computations and would report nonsense otherwise
            out = infer_fn(state, lw["image"].at[0, 0, 0, 0].set(float(i)),
                           lw["sizes"])
        jax.block_until_ready(out)
        iters = int(os.environ.get("BENCH_ITERS", "10"))
        t0 = time.time()
        for i in range(iters):
            out = infer_fn(
                state, lw["image"].at[0, 0, 0, 0].set(float(100 + i)),
                lw["sizes"])
            jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        result = {
            "metric": f"inference images/sec/chip ({family}, "
            f"{canvas[0]}x{canvas[1]}, batch {bpc * n_chips}, {platform})",
            "value": round(bpc * n_chips / dt / n_chips, 3),
            "unit": "img/s/chip",
            "vs_baseline": None,
        }
        print(json.dumps(result))
        return

    step_fn = make_train_step(cfg, det, tx)

    # warmup (compile) + 2 steps
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(state.params)

    # fetch the loss to host EVERY step: the tunnel runtime otherwise
    # overlaps/elides work and reports impossibly fast steps
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # lagged sync: fetch step i-2's loss while step i runs. A fetch every
    # step serializes host<->device and costs ~85ms/step through the tunnel;
    # no fetch at all lets the runtime elide work entirely (measured 600+
    # img/s nonsense). Two in flight matches a real training loop.
    t0 = time.time()
    pending = []
    total = 0.0
    for i in range(iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        pending.append(metrics["total_loss"])
        if len(pending) > 2:
            total += float(pending.pop(0))
    for p in pending:
        total += float(p)
    dt = (time.time() - t0) / iters

    imgs_per_iter = 2 * bpc * n_chips  # labeled + unlabeled streams
    img_per_s_per_chip = imgs_per_iter / dt / n_chips
    names = {
        "rcnn": "R50-FPN", "vitdet": "ViTDet-B", "convnext": "ConvNeXt-T",
        "yolo": "YOLOv5m", "detr": "DeformableDETR-R50",
    }
    from aldi_tpu.config import compute_dtype
    import numpy as np
    dt_str = str(np.dtype(compute_dtype(cfg)))
    dt_name = {"bfloat16": "bf16", "float32": "f32"}.get(dt_str, dt_str)
    # the assumed 5.0 img/s/chip yardstick is an R50-FPN figure; the
    # reference publishes no per-family throughput, so comparing ViTDet/
    # DETR rows against it would be misleading — those report null
    bwd = "" if cfg.SOLVER.BACKWARD_AT_END else ", stream-seq bwd"
    result = {
        "metric": f"aldi++ daod train images/sec/chip ({names[family]}, "
        f"{canvas[0]}x{canvas[1]}, {dt_name}, batch {bpc}+{bpc}{bwd}, "
        f"{platform})",
        "value": round(img_per_s_per_chip, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(
            img_per_s_per_chip / ASSUMED_BASELINE_IMG_PER_S_PER_CHIP, 3
        ) if family == "rcnn" else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
