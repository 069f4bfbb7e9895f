import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aldi_tpu.engine.checkpoint_convert import (
    _convert_array,
    _torch_name_for,
    torch_state_dict_to_tree,
)
from aldi_tpu.models import build_detector
from tests.test_rcnn_forward import tiny_cfg
from flax.traverse_util import flatten_dict


@pytest.fixture(scope="module")
def variables():
    det = build_detector(tiny_cfg())
    return jax.jit(det.init_variables)(jax.random.PRNGKey(0))


def _fake_torch_sd(params, frozen):
    """Build a D2-named state dict covering our tree, each tensor filled
    with a unique constant."""
    import torch

    sd = {}
    const = {}
    i = 0
    for tree, coll in ((params, "params"), (frozen, "frozen")):
        for path, v in flatten_dict(tree).items():
            name = _torch_name_for(path, coll)
            if name is None:
                continue
            arr = np.asarray(v)
            i += 1
            c = float(i)
            if path[-1] == "kernel" and arr.ndim == 4:
                t = np.full(
                    (arr.shape[3], arr.shape[2], arr.shape[0], arr.shape[1]),
                    c, np.float32,
                )  # OIHW
            elif path[-1] == "kernel" and arr.ndim == 2:
                t = np.full((arr.shape[1], arr.shape[0]), c, np.float32)
            else:
                t = np.full(arr.shape, c, np.float32)
            sd[name] = torch.from_numpy(t)
            const["/".join(path)] = c
    return sd, const


def test_roundtrip_all_rcnn_params_covered(variables):
    params = jax.device_get(variables["params"])
    frozen = jax.device_get(variables["frozen"])
    sd, const = _fake_torch_sd(params, frozen)
    new_params, new_frozen = torch_state_dict_to_tree(sd, params, frozen)
    missing = []
    for tree in (new_params, new_frozen):
        for path, v in flatten_dict(tree).items():
            key = "/".join(path)
            if key not in const:
                missing.append(key)
                continue
            np.testing.assert_allclose(
                np.asarray(v), const[key],
                err_msg=key,
            )
    # every parameter of the plain R-CNN maps to a substrate name
    assert not missing, missing


def test_fc1_layout_permutation():
    """fc1 consumes flattened pooled features: torch (C-major) vs ours
    (channel-last). A spatially-varying torch weight must land so that
    equal inputs produce equal outputs."""
    c, out = 4, 3
    # torch weight [out, C*7*7] with value = channel index
    w_t = np.zeros((out, c * 49), np.float32)
    for ch in range(c):
        w_t[:, ch * 49 : (ch + 1) * 49] = ch
    target = np.zeros((49 * c, out), np.float32)
    got = _convert_array(w_t, target, ("box_head", "fc1", "kernel"))
    # ours flattens [7,7,C]: kernel row index y*7C + x*C + ch -> value ch
    got = got.reshape(7, 7, c, out)
    for ch in range(c):
        np.testing.assert_allclose(got[:, :, ch], ch)


def test_shape_mismatch_skipped(variables):
    import torch

    params = jax.device_get(variables["params"])
    frozen = jax.device_get(variables["frozen"])
    sd = {
        "roi_heads.box_predictor.cls_score.weight":
            torch.zeros(99, 10),  # wrong shape
    }
    new_params, _ = torch_state_dict_to_tree(sd, params, frozen)
    np.testing.assert_allclose(
        np.asarray(new_params["box_predictor"]["cls_score"]["kernel"]),
        np.asarray(params["box_predictor"]["cls_score"]["kernel"]),
    )


def test_vit_names_covered():
    """Every ViTDet trunk param maps to a substrate backbone.net.* name
    (SimpleFeaturePyramid + heads intentionally partial until real zoo
    checkpoints are available to validate against)."""
    from aldi_tpu.models.vit import VIT_CONFIGS

    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_vitdet_b_backbone",
        "MODEL.ROI_BOX_HEAD.NORM": "LN",
        "MODEL.RPN.CONV_DIMS": [-1, -1],
    })
    orig = dict(VIT_CONFIGS["b"])
    VIT_CONFIGS["b"] = dict(embed_dim=64, depth=2, num_heads=2,
                            drop_path_rate=0.0, global_blocks=(1,))
    try:
        from aldi_tpu.models import build_detector

        det = build_detector(cfg)
        variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    finally:
        VIT_CONFIGS["b"] = orig
    params = jax.device_get(variables["params"])
    missing = []
    for path in flatten_dict(params):
        if path[0] != "backbone":
            continue
        name = _torch_name_for(path, "params")
        if name is None:
            missing.append("/".join(path))
    assert not missing, missing
    # spot-check exact names
    assert _torch_name_for(("backbone", "block0", "attn", "qkv", "kernel"),
                           "params") == "backbone.net.blocks.0.attn.qkv.weight"
    assert _torch_name_for(("backbone", "block11", "attn", "rel_pos_h"),
                           "params") == "backbone.net.blocks.11.attn.rel_pos_h"
    assert _torch_name_for(("backbone", "pos_embed"),
                           "params") == "backbone.net.pos_embed"


def test_pth_fresh_load_prefers_ema(tmp_path, variables):
    """A reference-style .pth with {model, ema} entries initializes the
    student from the EMA weights on fresh load (aldi/checkpoint.py:18-32)."""
    import torch

    from aldi_tpu.engine.checkpoint import load_reference_weights
    from aldi_tpu.engine.train_step import create_train_state
    from aldi_tpu.models import build_detector

    cfg = tiny_cfg(**{"EMA.ENABLED": True})
    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))

    params = jax.device_get(variables["params"])
    frozen = jax.device_get(variables["frozen"])
    sd_model, _ = _fake_torch_sd(params, frozen)
    # ema entries use the "model." prefix and DIFFERENT values
    sd_ema = {
        "model." + k: v + 1000.0 for k, v in sd_model.items()
    }
    path = str(tmp_path / "burnin.pth")
    torch.save({"model": sd_model, "ema": sd_ema, "iteration": 123}, path)

    loaded = load_reference_weights(state, path, load_from_ema=True)
    got = float(np.asarray(
        loaded.params["box_predictor"]["cls_score"]["kernel"]).ravel()[0])
    assert got > 999.0, got  # EMA values, not model values
    # and the teacher starts as a copy of the loaded student
    np.testing.assert_allclose(
        np.asarray(loaded.ema_params["box_predictor"]["cls_score"]["kernel"]),
        np.asarray(loaded.params["box_predictor"]["cls_score"]["kernel"]),
    )

    loaded2 = load_reference_weights(state, path, load_from_ema=False)
    got2 = float(np.asarray(
        loaded2.params["box_predictor"]["cls_score"]["kernel"]).ravel()[0])
    assert got2 < 999.0, got2  # model entry when EMA load disabled


def test_convnext_and_boxhead_ln_names():
    from aldi_tpu.models import build_detector

    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_convnext_fpn_backbone",
        "MODEL.CONVNEXT.DEPTHS": [1, 1, 1, 1],
        "MODEL.CONVNEXT.DIMS": [16, 32, 48, 64],
        "MODEL.ROI_BOX_HEAD.NORM": "LN",
        "MODEL.ROI_BOX_HEAD.NUM_CONV": 1,
    })
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    missing = [
        "/".join(p)
        for p in flatten_dict(jax.device_get(variables["params"]))
        if p[0] == "backbone" and _torch_name_for(p, "params") is None
    ]
    assert not missing, missing
    assert _torch_name_for(
        ("backbone", "downsample0_conv", "kernel"), "params"
    ) == "backbone.bottom_up.downsample_layers.0.0.weight"
    assert _torch_name_for(
        ("backbone", "downsample1_norm", "scale"), "params"
    ) == "backbone.bottom_up.downsample_layers.1.0.weight"
    assert _torch_name_for(
        ("backbone", "stage2_block0", "dwconv", "kernel"), "params"
    ) == "backbone.bottom_up.stages.2.0.dwconv.weight"
    assert _torch_name_for(
        ("backbone", "stage0_block0", "gamma"), "params"
    ) == "backbone.bottom_up.stages.0.0.gamma"
    assert _torch_name_for(
        ("box_head", "conv1_norm", "scale"), "params"
    ) == "roi_heads.box_head.conv1.norm.weight"


def test_checkpointer_persists_trainer_bookkeeping(tmp_path):
    """Best-AP50 bookkeeping rides the checkpoint (the reference's
    BestCheckpointer hook state is per-run only, aldi/trainer.py:187-196;
    we own the format, so persist it): a resumed run must see the saved
    best map and not re-save a worse "best"."""
    from aldi_tpu.engine.checkpoint import Checkpointer
    from aldi_tpu.engine.train_step import create_train_state
    from aldi_tpu.models import build_detector

    cfg = tiny_cfg()
    det = build_detector(cfg)
    state, _ = create_train_state(cfg, det, jax.random.PRNGKey(0))

    ckptr = Checkpointer(str(tmp_path))
    best = {"foggy_val": 51.25, "cs_val": 62.0}
    ckptr.save(state, extra={"best_ap50": best})

    ckptr2 = Checkpointer(str(tmp_path))
    assert ckptr2.has_checkpoint()
    got = ckptr2.load_extra()
    assert got == {"best_ap50": best}
    # a checkpoint without the sidecar degrades to empty bookkeeping
    ckptr2.save(state, name="no_extra")
    assert ckptr2.load_extra() == {}
