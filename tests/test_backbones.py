import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aldi_tpu.models import build_detector
from tests.test_rcnn_forward import tiny_batch, tiny_cfg


def _run_forward(cfg):
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    images, sizes, gt = tiny_batch()
    losses, aux = jax.jit(
        lambda v, im, sz, g, r: det.forward_train(v, im, sz, g, r)
    )(variables, images, sizes, gt, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    return det, variables, losses


def test_vitdet_b_tiny_forward():
    # shrink the ViT so the test compiles fast; exercises windows + global
    # blocks + rel pos + SFP + LN'd heads (ViTDet head config)
    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_vitdet_b_backbone",
        "MODEL.ROI_BOX_HEAD.NORM": "LN",
        "MODEL.ROI_BOX_HEAD.NUM_CONV": 2,
        "MODEL.ROI_BOX_HEAD.NUM_FC": 1,
        "MODEL.RPN.CONV_DIMS": [-1, -1],
    })
    from aldi_tpu.models.vit import VIT_CONFIGS

    orig = dict(VIT_CONFIGS["b"])
    VIT_CONFIGS["b"] = dict(
        embed_dim=64, depth=3, num_heads=2, drop_path_rate=0.1,
        global_blocks=(1,),
    )
    try:
        det, variables, losses = _run_forward(cfg)
    finally:
        VIT_CONFIGS["b"] = orig
    # windowed block at 128/16=8 tokens < window 14 exercises padding path
    assert "loss_cls" in losses


def test_convnext_tiny_forward():
    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_convnext_fpn_backbone",
        "MODEL.CONVNEXT.DEPTHS": [1, 1, 1, 1],
        "MODEL.CONVNEXT.DIMS": [32, 64, 96, 128],
    })
    det, variables, losses = _run_forward(cfg)
    assert "loss_rpn_cls" in losses


def test_vit_lr_decay_multipliers():
    from aldi_tpu.solver import _vit_lr_decay_multipliers

    params = {
        "backbone": {
            "patch_embed": {"kernel": jnp.zeros(1)},
            "pos_embed": jnp.zeros(1),
            "block0": {"attn": {"qkv": {"kernel": jnp.zeros(1)}}},
            "block11": {"attn": {"qkv": {"kernel": jnp.zeros(1)}}},
        },
        "rpn_head": {"conv": {"kernel": jnp.zeros(1)}},
    }
    m = _vit_lr_decay_multipliers(params, 12, 0.7)
    assert np.isclose(m["backbone"]["patch_embed"]["kernel"], 0.7 ** 13)
    assert np.isclose(m["backbone"]["pos_embed"], 0.7 ** 13)
    assert np.isclose(
        m["backbone"]["block0"]["attn"]["qkv"]["kernel"], 0.7 ** 12
    )
    assert np.isclose(
        m["backbone"]["block11"]["attn"]["qkv"]["kernel"], 0.7 ** 1
    )
    assert m["rpn_head"]["conv"]["kernel"] == 1.0


def test_resnet_fold_bn_equivalence():
    """fold_bn=True (BN affine folded into conv kernels) must compute the
    same function as the unfolded path on identical variables, in f32 to
    tight tolerance, with the same parameter/frozen name trees."""
    from aldi_tpu.models.resnet import ResNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), jnp.float32)

    folded = ResNet(depth=26, freeze_at=0, fold_bn=True)
    unfolded = ResNet(depth=26, freeze_at=0, fold_bn=False)
    variables = jax.jit(folded.init)(jax.random.PRNGKey(0), x)

    # randomize the frozen stats so the affine is non-trivial; running_var
    # must stay positive (rsqrt of a negative variance is NaN on both
    # paths and proves nothing)
    def perturb(path, v):
        leaf = path[-1].key
        if leaf == "running_var":
            return jnp.asarray(
                rng.uniform(0.25, 4.0, v.shape), v.dtype)
        if leaf in ("running_mean", "weight", "bias"):
            return jnp.asarray(rng.normal(size=v.shape), v.dtype)
        return v

    frozen = jax.tree_util.tree_map_with_path(
        perturb, variables["frozen"])
    variables = {"params": variables["params"], "frozen": frozen}

    # identical variable trees accepted by both paths
    assert (jax.tree_util.tree_structure(jax.eval_shape(
        lambda: unfolded.init(jax.random.PRNGKey(0), x)))
        == jax.tree_util.tree_structure(jax.eval_shape(
            lambda: folded.init(jax.random.PRNGKey(0), x))))

    out_f = jax.jit(folded.apply)(variables, x)
    out_u = jax.jit(unfolded.apply)(variables, x)
    for k in out_u:
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_u[k]),
            rtol=2e-4, atol=2e-4, err_msg=k)

    # gradients w.r.t. the conv kernels must agree too (the fold reroutes
    # the chain rule through W*s)
    def loss(fold):
        model = ResNet(depth=26, freeze_at=0, fold_bn=fold)

        def f(params):
            out = model.apply({"params": params, "frozen": frozen}, x)
            return sum(jnp.sum(v ** 2) for v in out.values())

        return jax.jit(jax.grad(f))(variables["params"])

    g_f, g_u = loss(True), loss(False)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(g_u))
    for path, leaf in flat_f:
        ref = flat_u[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref),
            rtol=5e-3, atol=5e-3 * max(1.0, float(jnp.abs(ref).max())),
            err_msg=jax.tree_util.keystr(path))


def test_window_partition_roundtrip():
    from aldi_tpu.models.vit import window_partition, window_unpartition

    x = jnp.arange(2 * 10 * 13 * 4, dtype=jnp.float32).reshape(2, 10, 13, 4)
    w, pad_hw = window_partition(x, 7)
    y = window_unpartition(w, 7, pad_hw, (10, 13))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
