"""Tensor-parallel (Megatron MLP) sharding over the 2-D data x model mesh.

Beyond-reference capability (the reference stack is DP-only, SURVEY §2.6):
``TPU.MESH_MODEL > 1`` column/row-shards the expand/contract matmul pairs
(ViT mlp_fc*, ConvNeXt pwconv*, DETR FFN linear*, box-head fc*). These
tests run a REAL jitted DAOD train step over a 4x2 virtual-CPU mesh and
check both the placement (leaves actually carry the model axis) and the
math (one TP step == one replicated step to f32 tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from flax.traverse_util import flatten_dict

from aldi_tpu.parallel.mesh import make_mesh, replicate, shard_batch, \
    shard_state, tp_spec


class _Leaf:
    def __init__(self, shape):
        self.shape = shape
        self.ndim = len(shape)
        self.size = int(np.prod(shape)) if shape else 0


def _key(*names):
    return tuple(jax.tree_util.DictKey(n) for n in names)


def test_tp_spec_rules():
    # expand: last dim sharded (kernel and bias)
    assert tp_spec(_key("box_head", "fc1", "kernel"),
                   _Leaf((128, 64)), 2) == P(None, "model")
    assert tp_spec(_key("box_head", "fc1", "bias"),
                   _Leaf((64,)), 2) == P("model")
    assert tp_spec(_key("block0", "mlp_fc1", "kernel"),
                   _Leaf((32, 128)), 4) == P(None, "model")
    # contract: first dim sharded, bias replicated
    assert tp_spec(_key("block0", "mlp_fc2", "kernel"),
                   _Leaf((128, 32)), 4) == P("model", None)
    assert tp_spec(_key("block0", "mlp_fc2", "bias"),
                   _Leaf((32,)), 4) == P()
    # optax state mirrors params under a prefix — suffix match still hits
    assert tp_spec(_key("opt_state", "1", "mu", "params", "stage0_block0",
                        "pwconv1", "kernel"),
                   _Leaf((16, 64)), 2) == P(None, "model")
    # ViT attention head sharding (DenseGeneral layouts)
    assert tp_spec(_key("block0", "attn", "qkv", "kernel"),
                   _Leaf((64, 3, 8, 8)), 4) == P(None, None, "model", None)
    assert tp_spec(_key("block0", "attn", "qkv", "bias"),
                   _Leaf((3, 8, 8)), 4) == P(None, "model", None)
    assert tp_spec(_key("block0", "attn", "proj", "kernel"),
                   _Leaf((8, 8, 64)), 4) == P("model", None, None)
    assert tp_spec(_key("block0", "attn", "proj", "bias"),
                   _Leaf((64,)), 4) == P()
    # non-divisible dims fall back to replication
    assert tp_spec(_key("box_head", "fc1", "kernel"),
                   _Leaf((128, 63)), 2) == P()
    # unmatched names replicate
    assert tp_spec(_key("rpn_head", "conv", "kernel"),
                   _Leaf((3, 3, 16, 16)), 2) == P()
    # no false hit on names merely containing fc1
    assert tp_spec(_key("head", "notfc1", "kernel"),
                   _Leaf((16, 16)), 2) == P()


def _tiny(daod):
    import __graft_entry__ as ge

    cfg = ge._tiny_cfg(canvas=(64, 64), depth=26, daod=daod)
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.freeze()
    return cfg


def _setup(cfg):
    import __graft_entry__ as ge
    from aldi_tpu.engine import create_train_state, make_train_step
    from aldi_tpu.models import build_detector

    det = build_detector(cfg)
    _, tx = create_train_state(cfg, det, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, det, tx)
    batch = ge._fake_batch(8, det.canvas, cfg.TPU.MAX_GT,
                           "unlabeled_strong" in cfg.DATASETS.BATCH_CONTENTS)

    def fresh_state():
        # fresh per run: step_fn donates its input, and device_put aliases
        # replicated leaves across identical device sets — sharing one
        # state object would hand the second step already-consumed buffers
        from aldi_tpu.engine import create_train_state as cts
        s, _ = cts(cfg, det, jax.random.PRNGKey(0))
        return s

    return fresh_state, step_fn, batch


def test_tp_burnin_step_matches_dp():
    """One burn-in train step on the 4x2 (data x model) mesh must produce
    the same parameters as the replicated 8-way DP step — GSPMD inserts
    the Megatron collectives without changing the math. (The DAOD step is
    checked as a smoke test only: the teacher's box head runs through the
    TP-sharded matmuls, and its reduction-order epsilons legitimately flip
    discrete pseudo-label gates — NMS, score thresholds, anchor matching —
    so distill losses are not bit-comparable across shardings.)"""
    fresh_state, step_fn, batch = _setup(_tiny(daod=False))

    mesh_dp = make_mesh(8)
    s_dp = replicate(fresh_state(), mesh_dp)
    out_dp, m_dp = step_fn(s_dp, shard_batch(batch, mesh_dp),
                           jax.random.PRNGKey(1))

    mesh_tp = make_mesh(8, model_parallel=2)
    s_tp = shard_state(fresh_state(), mesh_tp)
    # placement: the box-head expand kernel must actually be sharded on the
    # model axis (a silent no-match would quietly degrade to pure DP)
    tp_leaves = [k for k, v in flatten_dict(s_tp.params).items()
                 if "model" in str(v.sharding.spec)]
    assert any("fc1" in "/".join(k) for k in tp_leaves), (
        f"no fc1 leaf sharded on the model axis: {sorted(tp_leaves)[:5]}")
    out_tp, m_tp = step_fn(s_tp, shard_batch(batch, mesh_tp),
                           jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(jax.device_get(m_tp["total_loss"])),
        float(jax.device_get(m_dp["total_loss"])), rtol=1e-5, atol=1e-5)
    p_dp = flatten_dict(jax.device_get(out_dp.params))
    p_tp = flatten_dict(jax.device_get(out_tp.params))
    worst = 0.0
    for k in p_dp:
        a, b = np.asarray(p_dp[k]), np.asarray(p_tp[k])
        if a.dtype.kind == "f":
            worst = max(worst, float(np.max(np.abs(a - b))))
    assert worst < 1e-4, f"TP step diverged from DP step by {worst}"
    # updated params keep their shardings (donated-state round trip)
    after = flatten_dict(out_tp.params)
    assert any("model" in str(v.sharding.spec) for v in after.values())


def test_tp_daod_step_smoke():
    """Full DAOD step (teacher + pseudo-labels + distill) compiles and
    runs on the 4x2 mesh with finite losses."""
    fresh_state, step_fn, batch = _setup(_tiny(daod=True))
    mesh_tp = make_mesh(8, model_parallel=2)
    s_tp = shard_state(fresh_state(), mesh_tp)
    out, metrics = step_fn(s_tp, shard_batch(batch, mesh_tp),
                           jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(jax.device_get(v))), k
    assert int(jax.device_get(out.step)) == 1


def test_fsdp_step_matches_dp():
    """ZeRO/FSDP sharding (TPU.FSDP): big params + optimizer moments live
    sharded over the data axis; GSPMD all-gathers weights at use and
    reduce-scatters grads — one step must equal the replicated step."""
    from aldi_tpu.parallel.mesh import fsdp_spec

    # rule unit checks
    assert fsdp_spec(_Leaf((1 << 9, 1 << 9)), 8) in (
        P("data", None), P(None, "data"))  # square: either dim
    big = _Leaf((3, 3, 64, 512))
    big.size = 3 * 3 * 64 * 512
    assert fsdp_spec(big, 8) == P(None, None, None, "data")
    small = _Leaf((256,))
    small.size = 256
    assert fsdp_spec(small, 8) == P()  # below the min-size threshold
    odd = _Leaf((3, 3, 3, 3))
    odd.size = 1 << 20  # big but no divisible dim
    assert fsdp_spec(odd, 8) == P()

    fresh_state, step_fn, batch = _setup(_tiny(daod=False))

    mesh = make_mesh(8)
    s_dp = replicate(fresh_state(), mesh)
    out_dp, m_dp = step_fn(s_dp, shard_batch(batch, mesh),
                           jax.random.PRNGKey(1))

    s_fs = shard_state(fresh_state(), mesh, fsdp=True)
    sharded = [k for k, v in flatten_dict(s_fs.params).items()
               if "data" in str(v.sharding.spec)]
    assert sharded, "FSDP sharded no parameter"
    # the optimizer moments (the ZeRO memory win) must be sharded too
    opt_leaves = [x for x in jax.tree_util.tree_leaves(s_fs.opt_state)
                  if hasattr(x, "sharding") and x.size >= (1 << 16)]
    assert any("data" in str(x.sharding.spec) for x in opt_leaves), (
        "no optimizer moment took the data-axis sharding")
    out_fs, m_fs = step_fn(s_fs, shard_batch(batch, mesh),
                           jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(jax.device_get(m_fs["total_loss"])),
        float(jax.device_get(m_dp["total_loss"])), rtol=1e-5, atol=1e-5)
    p_dp = flatten_dict(jax.device_get(out_dp.params))
    p_fs = flatten_dict(jax.device_get(out_fs.params))
    worst = max(
        float(np.max(np.abs(np.asarray(p_dp[k]) - np.asarray(p_fs[k]))))
        for k in p_dp if np.asarray(p_dp[k]).dtype.kind == "f")
    assert worst < 1e-4, f"FSDP step diverged from DP step by {worst}"


def test_fsdp_composes_with_tp():
    """FSDP + MESH_MODEL together on the 4x2 mesh: TP leaves keep the
    Megatron spec, other big leaves ZeRO-shard over data, and the step
    still equals the replicated one (burn-in: no discrete teacher gates)."""
    fresh_state, step_fn, batch = _setup(_tiny(daod=False))

    mesh_dp = make_mesh(8)
    s_dp = replicate(fresh_state(), mesh_dp)
    out_dp, m_dp = step_fn(s_dp, shard_batch(batch, mesh_dp),
                           jax.random.PRNGKey(1))

    mesh = make_mesh(8, model_parallel=2)
    s = shard_state(fresh_state(), mesh, fsdp=True)
    flat = flatten_dict(s.params)
    specs = {k: str(v.sharding.spec) for k, v in flat.items()}
    assert any("model" in sp for sp in specs.values())
    assert any("data" in sp for sp in specs.values())
    # the box-head expand kernel keeps its TP spec (rule priority)
    fc1 = [sp for k, sp in specs.items()
           if k[-2:] == ("fc1", "kernel") and "box_head" in k]
    assert fc1 and all("model" in sp for sp in fc1)
    out, m = step_fn(s, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(jax.device_get(m["total_loss"])),
        float(jax.device_get(m_dp["total_loss"])), rtol=1e-5, atol=1e-5)
    p_dp = flatten_dict(jax.device_get(out_dp.params))
    p = flatten_dict(jax.device_get(out.params))
    worst = max(
        float(np.max(np.abs(np.asarray(p_dp[k]) - np.asarray(p[k]))))
        for k in p_dp if np.asarray(p_dp[k]).dtype.kind == "f")
    assert worst < 1e-4, f"FSDP+TP step diverged by {worst}"


def test_tp_vit_attention_heads_sharded():
    """ViTDet under TP: the head-major qkv/proj DenseGeneral layouts take
    the model axis and a sharded forward still produces finite losses."""
    from tests.test_rcnn_forward import tiny_cfg
    from aldi_tpu.models import build_detector
    from aldi_tpu.models.vit import VIT_CONFIGS

    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_vitdet_b_backbone",
        "MODEL.ROI_BOX_HEAD.NORM": "LN",
        "MODEL.ROI_BOX_HEAD.NUM_CONV": 2,
        "MODEL.ROI_BOX_HEAD.NUM_FC": 1,
        "MODEL.RPN.CONV_DIMS": [-1, -1],
    })
    orig = dict(VIT_CONFIGS["b"])
    VIT_CONFIGS["b"] = dict(
        embed_dim=64, depth=3, num_heads=2, drop_path_rate=0.0,
        global_blocks=(1,),
    )
    try:
        det = build_detector(cfg)
        variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
        mesh = make_mesh(8, model_parallel=2)
        v_tp = shard_state(dict(variables), mesh)
        flat = flatten_dict(v_tp["params"])
        qkv = [k for k in flat if k[-2:] == ("qkv", "kernel")]
        assert qkv and all(
            "model" in str(flat[k].sharding.spec) for k in qkv)
        proj = [k for k in flat
                if k[-2:] == ("proj", "kernel") and "attn" in k]
        assert proj and all(
            "model" in str(flat[k].sharding.spec) for k in proj)

        import __graft_entry__ as ge
        batch = ge._fake_batch(8, det.canvas, cfg.TPU.MAX_GT, False)
        images = jax.device_put(
            batch["labeled"]["image"],
            jax.sharding.NamedSharding(mesh, P("data")))
        sizes = jax.device_put(
            batch["labeled"]["sizes"],
            jax.sharding.NamedSharding(mesh, P("data")))
        out = jax.jit(det.forward_inference)(v_tp, images, sizes)
        for leaf in jax.tree_util.tree_leaves(out):
            assert np.all(np.isfinite(np.asarray(
                jax.device_get(leaf), dtype=np.float64)))
    finally:
        VIT_CONFIGS["b"] = orig


def test_tp_inference_matches_replicated():
    """Serving path under model sharding: forward_inference (student
    forward + NMS postprocess) with TP-sharded params must produce the
    detections of the replicated run — the eval/pseudo-label flow the
    trainer drives with a live mesh."""
    from aldi_tpu.models import build_detector
    from aldi_tpu.engine import create_train_state

    cfg = _tiny(daod=False)
    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))
    variables = {"params": state.params, "frozen": state.frozen}
    import __graft_entry__ as ge
    batch = ge._fake_batch(8, det.canvas, cfg.TPU.MAX_GT, False)
    images, sizes = batch["labeled"]["image"], batch["labeled"]["sizes"]

    infer = jax.jit(det.forward_inference)

    mesh_dp = make_mesh(8)
    v_dp = replicate(variables, mesh_dp)
    out_dp = jax.device_get(infer(
        v_dp, *jax.device_put(
            (images, sizes),
            jax.sharding.NamedSharding(mesh_dp, P("data")))))

    mesh_tp = make_mesh(8, model_parallel=2)
    v_tp = shard_state(variables, mesh_tp)
    out_tp = jax.device_get(infer(
        v_tp, *jax.device_put(
            (images, sizes),
            jax.sharding.NamedSharding(mesh_tp, P("data")))))

    boxes_dp, scores_dp, classes_dp, valid_dp = map(np.asarray, out_dp)
    boxes_tp, scores_tp, classes_tp, valid_tp = map(np.asarray, out_tp)
    # not compared slot-by-slot: the box head runs through the TP-sharded
    # matmuls and a score sitting exactly on the NMS/threshold boundary
    # could flip a keep decision under reduction-order epsilons — compare
    # the detection SETS per image (score-sorted) with small tolerances
    for i in range(boxes_dp.shape[0]):
        d, t = valid_dp[i].astype(bool), valid_tp[i].astype(bool)
        assert abs(int(d.sum()) - int(t.sum())) <= 1, (
            f"image {i}: {d.sum()} vs {t.sum()} detections")
        n = min(int(d.sum()), int(t.sum()))
        od = np.argsort(-scores_dp[i][d])[:n]
        ot = np.argsort(-scores_tp[i][t])[:n]
        np.testing.assert_allclose(
            scores_dp[i][d][od], scores_tp[i][t][ot],
            rtol=1e-4, atol=1e-5, err_msg=f"image {i} scores")
        np.testing.assert_array_equal(
            classes_dp[i][d][od], classes_tp[i][t][ot],
            err_msg=f"image {i} classes")
        np.testing.assert_allclose(
            boxes_dp[i][d][od], boxes_tp[i][t][ot],
            rtol=1e-3, atol=1e-3, err_msg=f"image {i} boxes")
