import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aldi_tpu.config import get_cfg
from aldi_tpu.engine import create_train_state, make_train_step
from aldi_tpu.models import build_detector
from tests.test_rcnn_forward import tiny_batch


def detr_cfg(**overrides):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
    cfg.MODEL.PIXEL_MEAN = [123.675, 116.280, 103.530]
    cfg.MODEL.PIXEL_STD = [58.395, 57.120, 57.375]
    dd = cfg.MODEL.DEFORMABLE_DETR
    dd.NUM_CLASSES = 3
    dd.TRANSFORMER.ENC_LAYERS = 2
    dd.TRANSFORMER.DEC_LAYERS = 2
    dd.TRANSFORMER.NUM_QUERIES = 20
    dd.TRANSFORMER.HIDDEN_DIM = 64
    dd.TRANSFORMER.DIM_FEEDFORWARD = 128
    dd.TRANSFORMER.NHEADS = 4
    cfg.MODEL.RESNETS.DEPTH = 26
    cfg.TPU.CANVAS = (128, 128)
    cfg.TPU.MAX_GT = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.SOLVER.OPTIMIZER = "ADAMW"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_ITERS = 0
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def test_ms_deform_attn_core_uniform_field():
    # constant value field -> any sampling location returns the constant
    from aldi_tpu.ops.ms_deform_attn import ms_deform_attn_core

    b, h, d = 1, 2, 4
    shapes = [(8, 8), (4, 4)]
    lv = sum(a * c for a, c in shapes)
    value = jnp.ones((b, lv, h, d)) * jnp.asarray([1.0, 2.0])[None, None, :,
                                                              None]
    lq, L, P = 5, 2, 3
    key = jax.random.PRNGKey(0)
    loc = jax.random.uniform(key, (b, lq, h, L, P, 2), minval=0.2, maxval=0.8)
    w = jax.nn.softmax(jax.random.normal(key, (b, lq, h, L, P)).reshape(
        b, lq, h, L * P), -1).reshape(b, lq, h, L, P)
    out = ms_deform_attn_core(value, shapes, loc, w)
    out = out.reshape(b, lq, h, d)
    np.testing.assert_allclose(np.asarray(out[..., 0, :]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[..., 1, :]), 2.0, atol=1e-5)


def test_ms_deform_attn_zero_pad_outside():
    from aldi_tpu.ops.ms_deform_attn import ms_deform_attn_core

    value = jnp.ones((1, 16, 1, 2))
    loc = jnp.full((1, 1, 1, 1, 1, 2), 3.0)  # far outside
    w = jnp.ones((1, 1, 1, 1, 1))
    out = ms_deform_attn_core(value, [(4, 4)], loc, w)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_ms_deform_attn_matches_numpy_bilinear_oracle():
    """All head_group gather layouts vs a direct numpy grid_sample
    (align_corners=False, zero pad) transcription."""
    from aldi_tpu.ops.ms_deform_attn import ms_deform_attn_core

    rng = np.random.default_rng(3)
    b, h, d, P = 2, 4, 8, 3
    shapes = [(6, 9), (3, 5)]
    L = len(shapes)
    lv = sum(a * c for a, c in shapes)
    lq = 17
    value = rng.normal(size=(b, lv, h, d)).astype(np.float32)
    loc = (rng.random((b, lq, h, L, P, 2)) * 1.4 - 0.2).astype(np.float32)
    attn = rng.random((b, lq, h, L, P)).astype(np.float32)

    starts = np.cumsum([0] + [a * c for a, c in shapes])[:-1]
    want = np.zeros((b, lq, h, d), np.float32)
    for bi in range(b):
        for q in range(lq):
            for hi in range(h):
                for li, (hh, ww) in enumerate(shapes):
                    grid = value[bi, starts[li]:starts[li] + hh * ww, hi]
                    grid = grid.reshape(hh, ww, d)
                    for p in range(P):
                        x = loc[bi, q, hi, li, p, 0] * ww - 0.5
                        y = loc[bi, q, hi, li, p, 1] * hh - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        lx, ly = x - x0, y - y0
                        acc = np.zeros(d, np.float32)
                        for (yy, xx, cw) in (
                            (y0, x0, (1 - ly) * (1 - lx)),
                            (y0, x0 + 1, (1 - ly) * lx),
                            (y0 + 1, x0, ly * (1 - lx)),
                            (y0 + 1, x0 + 1, ly * lx),
                        ):
                            if 0 <= yy < hh and 0 <= xx < ww:
                                acc += cw * grid[yy, xx]
                        want[bi, q, hi] += attn[bi, q, hi, li, p] * acc
    want = want.reshape(b, lq, h * d)

    got = ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_ms_deform_attn_gradients_match_naive_reference():
    """Backward parity for the lane-flat MXU formulation: grads wrt value,
    sampling locations, and attention weights against jax.grad of a naive
    differentiable per-corner transcription (same zero-pad semantics)."""
    from aldi_tpu.ops.ms_deform_attn import ms_deform_attn_core

    rng = np.random.default_rng(7)
    b, h, d, P = 2, 2, 4, 2
    shapes = [(5, 7), (3, 4)]
    L = len(shapes)
    lv = sum(a * c for a, c in shapes)
    lq = 9
    value = jnp.asarray(rng.normal(size=(b, lv, h, d)).astype(np.float32))
    # keep locations off exact cell boundaries (grad wrt loc is piecewise)
    loc = jnp.asarray(
        (rng.random((b, lq, h, L, P, 2)) * 1.2 - 0.1).astype(np.float32))
    attn = jnp.asarray(rng.random((b, lq, h, L, P)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(b, lq, h * d)).astype(np.float32))

    def naive(value, loc, attn):
        starts = np.cumsum([0] + [a * c for a, c in shapes])[:-1]
        out = jnp.zeros((b, lq, h, d), jnp.float32)
        for li, (hh, ww) in enumerate(shapes):
            grid = value[:, starts[li]:starts[li] + hh * ww].reshape(
                b, hh, ww, h, d)
            x = loc[:, :, :, li, :, 0] * ww - 0.5  # [B, Lq, H, P]
            y = loc[:, :, :, li, :, 1] * hh - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            lx, ly = x - x0, y - y0
            for dy, dx, cw in (
                (0, 0, (1 - ly) * (1 - lx)), (0, 1, (1 - ly) * lx),
                (1, 0, ly * (1 - lx)), (1, 1, ly * lx),
            ):
                yy = y0.astype(jnp.int32) + dy
                xx = x0.astype(jnp.int32) + dx
                inside = ((yy >= 0) & (yy < hh) & (xx >= 0) & (xx < ww))
                yc = jnp.clip(yy, 0, hh - 1)
                xc = jnp.clip(xx, 0, ww - 1)
                bi = jnp.arange(b)[:, None, None, None]
                hi = jnp.arange(h)[None, None, :, None]
                g = grid[bi, yc, xc, hi]  # [B, Lq, H, P, D]
                term = (cw * attn[:, :, :, li] * inside)[..., None] * g
                out = out + term.sum(axis=3)
        return out.reshape(b, lq, h * d)

    def loss(fn):
        return lambda v, lo, a: jnp.vdot(fn(v, lo, a), cot)

    got = jax.grad(
        loss(lambda v, lo, a: ms_deform_attn_core(v, shapes, lo, a)),
        argnums=(0, 1, 2))(value, loc, attn)
    want = jax.grad(loss(naive), argnums=(0, 1, 2))(value, loc, attn)
    for g, w, name in zip(got, want, ("value", "loc", "attn")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
            err_msg=f"grad wrt {name}")


def test_hungarian_match_prefers_right_queries():
    from aldi_tpu.models.detr import hungarian_match

    # 4 queries, 2 gt; query 2 matches gt0 box exactly, query 0 matches gt1
    pred = jnp.asarray([[[0.7, 0.7, 0.2, 0.2],
                         [0.1, 0.1, 0.05, 0.05],
                         [0.3, 0.3, 0.2, 0.2],
                         [0.9, 0.9, 0.1, 0.1]]])
    gt = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    logits = jnp.zeros((1, 4, 3))
    classes = jnp.asarray([[0, 1]])
    valid = jnp.asarray([[True, True]])
    q_idx, pv = hungarian_match(logits, pred, gt, classes, valid)
    np.testing.assert_array_equal(np.asarray(q_idx[0]), [2, 0])


def test_hungarian_match_optimal_vs_scipy():
    """hungarian_match's assignment on padded inputs == scipy optimum on
    the valid sub-problem (totals; assignments may differ only on ties)."""
    from scipy.optimize import linear_sum_assignment

    from aldi_tpu.models.detr import hungarian_match
    from aldi_tpu.ops import boxes as box_ops

    rng = np.random.default_rng(7)
    Q, G, K = 40, 16, 5
    for _ in range(5):
        V = int(rng.integers(1, 14))
        logits = rng.normal(size=(1, Q, K)).astype(np.float32)
        pb = rng.uniform(0.1, 0.8, (1, Q, 4)).astype(np.float32)
        gb = rng.uniform(0.2, 0.7, (1, G, 4)).astype(np.float32)
        gc = rng.integers(0, K, (1, G)).astype(np.int32)
        gv = np.zeros((1, G), bool)
        gv[:, :V] = True
        q_idx, pv = hungarian_match(
            jnp.asarray(logits), jnp.asarray(pb), jnp.asarray(gb),
            jnp.asarray(gc), jnp.asarray(gv),
        )
        q_idx = np.asarray(q_idx[0])

        # rebuild the cost matrix with the same math (f32, matching
        # hungarian_match's formula) and score both assignments on it
        prob = 1.0 / (1.0 + np.exp(-logits[0]))
        neg = 0.75 * prob ** 2 * (-np.log(np.clip(1 - prob, 1e-8, None)))
        pos = 0.25 * (1 - prob) ** 2 * (-np.log(np.clip(prob, 1e-8, None)))
        c_cls = (pos - neg)[:, gc[0]]
        c_l1 = np.abs(pb[0][:, None, :] - gb[0][None, :, :]).sum(-1)
        c_giou = -np.asarray(box_ops.pairwise_giou(
            box_ops.cxcywh_to_xyxy(jnp.asarray(pb[0])),
            box_ops.cxcywh_to_xyxy(jnp.asarray(gb[0])),
        ))
        cost = 2.0 * c_cls + 5.0 * c_l1 + 2.0 * c_giou
        got = sum(cost[q_idx[g], g] for g in range(V))
        assert len({int(q_idx[g]) for g in range(V)}) == V  # distinct
        r, c = linear_sum_assignment(cost[:, :V])
        np.testing.assert_allclose(got, cost[r, c].sum(), rtol=1e-4)


def test_detr_losses_all_layers_matches_per_layer_loop():
    """Vectorized all-layer criterion == per-layer calls (same math)."""
    from aldi_tpu.models.detr import (
        detr_losses_all_layers, detr_losses_single_layer,
    )

    rng = np.random.default_rng(3)
    L, B, Q, K, G = 3, 2, 20, 5, 8
    logits = jnp.asarray(rng.normal(size=(L, B, Q, K)).astype(np.float32))
    pboxes = jnp.asarray(rng.uniform(0.2, 0.6, (L, B, Q, 4)).astype(
        np.float32))
    gt = jnp.asarray(rng.uniform(0.25, 0.55, (B, G, 4)).astype(np.float32))
    classes = jnp.asarray(rng.integers(0, K, (B, G)).astype(np.int32))
    valid = jnp.asarray(np.tile(np.arange(G) < 5, (B, 1)))
    nb = jnp.asarray(10.0, jnp.float32)
    ce_v, l1_v, gi_v = detr_losses_all_layers(
        logits, pboxes, gt, classes, valid, K, 0.25, nb)
    for i in range(L):
        ce, l1, gi = detr_losses_single_layer(
            logits[i], pboxes[i], gt, classes, valid, K, 0.25, nb)
        np.testing.assert_allclose(float(ce_v[i]), float(ce), rtol=1e-5)
        np.testing.assert_allclose(float(l1_v[i]), float(l1), rtol=1e-5)
        np.testing.assert_allclose(float(gi_v[i]), float(gi), rtol=1e-5)


def test_detr_forward_train_and_inference():
    cfg = detr_cfg()
    cfg.freeze()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    images, sizes, gt = tiny_batch()
    losses, aux = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(v, im, sz, g, r)
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_ce_0"):
        assert k in losses and np.isfinite(float(losses[k])), k
    boxes, scores, classes, valid = jax.jit(det.forward_inference)(
        variables, images, sizes
    )
    assert boxes.shape == (2, 10, 4)
    assert float(scores.min()) >= 0


def test_detr_daod_step_hard_distill():
    cfg = detr_cfg(**{
        "DATASETS.BATCH_CONTENTS": ("labeled_strong", "unlabeled_strong"),
        "DATASETS.BATCH_RATIOS": (1, 1),
        "DATASETS.UNLABELED": ("fake",),
        "EMA.ENABLED": True,
        "DOMAIN_ADAPT.TEACHER.THRESHOLD": 0.0,
        "DOMAIN_ADAPT.DISTILL.ROIH_CLS_ENABLED": True,
        "DOMAIN_ADAPT.DISTILL.OBJ_ENABLED": True,
        "SOLVER.CLIP_GRADIENTS.ENABLED": True,
        "SOLVER.CLIP_GRADIENTS.CLIP_TYPE": "norm",
        "SOLVER.CLIP_GRADIENTS.CLIP_VALUE": 0.1,
    })
    cfg.freeze()
    det = build_detector(cfg)
    state, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)
    from tests.test_train_step import make_batch

    batch = make_batch(with_unlabeled=True)
    pre_qe = np.asarray(state.params["query_embed"])
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    # hard distill: the standard DETR losses appear under _distill, ungated
    assert "loss_ce_distill" in metrics
    assert float(metrics["loss_ce_distill"]) > 0.0
    assert np.isfinite(float(metrics["total_loss"]))
    # EMA excludes query_embed: copied from the pre-update student (the EMA
    # update runs before the optimizer step, reference before_step timing),
    # not blended
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["query_embed"]), pre_qe
    )


def test_detr_box_refine_variant():
    """WITH_BOX_REFINE (configs/Base-DETR.yaml:21): per-layer heads,
    reference points refined between decoder layers — losses finite, per-
    layer boxes actually differ (they would be identical functions of one
    shared ref otherwise), and the step is differentiable."""
    cfg = detr_cfg(**{"MODEL.DEFORMABLE_DETR.WITH_BOX_REFINE": True})
    cfg.freeze()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    # per-layer (unshared) heads exist
    assert "class_embed0" in variables["params"]
    assert "class_embed1" in variables["params"]
    assert "class_embed" not in variables["params"]
    images, sizes, gt = tiny_batch()
    losses, _ = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(v, im, sz, g, r)
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k in ("loss_ce", "loss_bbox", "loss_giou", "loss_ce_0"):
        assert k in losses and np.isfinite(float(losses[k])), k

    out = det.module.apply(
        variables, det.preprocess(images), sizes, False
    )
    assert not np.allclose(
        np.asarray(out["boxes"][0]), np.asarray(out["boxes"][1])
    )

    def loss_fn(params):
        v = {**variables, "params": params}
        losses, _ = det.forward_train(v, images, sizes, gt,
                                      jax.random.PRNGKey(1))
        return sum(jax.tree_util.tree_leaves(losses))

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    gn = np.sqrt(sum(
        float((g.astype(np.float32) ** 2).sum())
        for g in jax.tree_util.tree_leaves(jax.device_get(grads))
    ))
    assert np.isfinite(gn) and gn > 0


def test_detr_two_stage_variant():
    """TWO_STAGE (configs/Base-DETR.yaml:22): encoder proposals scored,
    top-k become the object queries; the encoder-output loss is emitted
    class-agnostically (official bin_targets semantics)."""
    cfg = detr_cfg(**{
        "MODEL.DEFORMABLE_DETR.TWO_STAGE": True,
        "MODEL.DEFORMABLE_DETR.WITH_BOX_REFINE": True,
    })
    cfg.freeze()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    assert "query_embed" not in variables["params"]
    for key in ("enc_output", "pos_trans", "class_embed_enc",
                "bbox_embed_enc"):
        assert key in variables["params"], key
    images, sizes, gt = tiny_batch()
    losses, _ = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(v, im, sz, g, r)
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k in ("loss_ce", "loss_bbox", "loss_ce_enc", "loss_bbox_enc",
              "loss_giou_enc"):
        assert k in losses and np.isfinite(float(losses[k])), k
    boxes, scores, classes, valid = jax.jit(det.forward_inference)(
        variables, images, sizes
    )
    assert boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(scores)).all()
