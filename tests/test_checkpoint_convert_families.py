"""Converter coverage + numeric layout tests for the ViTDet-SFP, YOLO, and
DETR checkpoint name maps (reference init paths: aldi/checkpoint.py:18-32,
configs/Base-Yolo.yaml:18, configs/Base-DETR.yaml:4-5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from aldi_tpu.config import get_cfg
from aldi_tpu.engine.checkpoint_convert import (
    _candidates_for,
    _convert_array,
    _detect_family,
    torch_state_dict_to_tree,
)
from aldi_tpu.models import build_detector


def _fake_sd_for(params, frozen, model_state=None, family=None):
    """Build a torch-convention state dict covering the tree with unique
    constants per flax leaf. Returns (sd, {flax_key: const})."""
    import torch

    family = family or _detect_family(params)
    sd, const = {}, {}
    i = 0
    trees = [(params, "params"), (frozen, "frozen")]
    for coll, t in (model_state or {}).items():
        trees.append((t, coll))
    packed = {}  # in_proj tensors assembled from q/k/v thirds
    for tree, coll in trees:
        for path, v in flatten_dict(tree).items():
            names, tag = _candidates_for(path, coll, family)
            if not names:
                continue
            name = names[0]
            arr = np.asarray(v)
            i += 1
            c = float(i)
            const["/".join(path)] = c
            leaf = path[-1]
            if tag in ("mha_q", "mha_k", "mha_v"):
                d = int(np.prod(arr.shape[1:])) if leaf == "kernel" else int(
                    np.prod(arr.shape))
                din = arr.shape[0] if leaf == "kernel" else None
                if name not in packed:
                    shape = (3 * d, din) if leaf == "kernel" else (3 * d,)
                    packed[name] = np.zeros(shape, np.float32)
                sl = {"mha_q": 0, "mha_k": 1, "mha_v": 2}[tag]
                packed[name][sl * d:(sl + 1) * d] = c
                continue
            if tag == "mha_out":
                if leaf == "kernel":  # flax [h, hd, D] -> torch [D, h*hd]
                    t = np.full((arr.shape[2], arr.shape[0] * arr.shape[1]),
                                c, np.float32)
                else:
                    t = np.full(arr.shape, c, np.float32)
            elif leaf == "kernel" and len(path) > 1 and "deconv" in path[-2]:
                # torch ConvTranspose2d [in, out, kH, kW]
                t = np.full((arr.shape[2], arr.shape[3], arr.shape[0],
                             arr.shape[1]), c, np.float32)
            elif leaf == "kernel" and arr.ndim == 4:
                t = np.full((arr.shape[3], arr.shape[2], arr.shape[0],
                             arr.shape[1]), c, np.float32)
            elif leaf == "kernel" and arr.ndim == 2:
                t = np.full((arr.shape[1], arr.shape[0]), c, np.float32)
            else:
                t = np.full(arr.shape, c, np.float32)
            sd[name] = torch.from_numpy(t)
    for name, t in packed.items():
        import torch as _t

        sd[name] = _t.from_numpy(t)
    return sd, const


def _assert_covered(new_trees, const, allow_missing=()):
    missing = []
    for tree in new_trees:
        for path, v in flatten_dict(tree).items():
            key = "/".join(path)
            if key not in const:
                if not any(key.startswith(a) for a in allow_missing):
                    missing.append(key)
                continue
            np.testing.assert_allclose(np.asarray(v), const[key], err_msg=key)
    assert not missing, missing


def test_yolo_roundtrip_full_coverage():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "Yolo"
    cfg.MODEL.YAML = "yolov5://yolov5n.yaml"
    cfg.MODEL.YOLO.NUM_CLASSES = 3
    cfg.TPU.CANVAS = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.freeze()
    det = build_detector(cfg)
    v = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    params = jax.device_get(v["params"])
    ms = {"batch_stats": jax.device_get(v["batch_stats"])}
    assert _detect_family(params) == "yolo"
    sd, const = _fake_sd_for(params, {}, ms)
    new_p, new_f, new_ms = torch_state_dict_to_tree(sd, params, {}, ms)
    _assert_covered([new_p, new_ms["batch_stats"]], const)


def test_yolo_accepts_stripped_and_wrapped_prefixes():
    from aldi_tpu.engine.checkpoint_convert import _yolo_name_for

    names = _yolo_name_for(("b0", "conv", "kernel"), "params")
    assert "model.0.conv.weight" in names
    assert "0.conv.weight" in names
    assert "model.model.0.conv.weight" in names
    names = _yolo_name_for(("b4", "m0", "cv1", "bn", "scale"), "params")
    assert "model.4.m.0.cv1.bn.weight" in names
    names = _yolo_name_for(("detect2", "bias"), "params")
    assert "model.24.m.2.bias" in names
    names = _yolo_name_for(("b0", "bn", "mean"), "batch_stats")
    assert "model.0.bn.running_mean" in names


def detr_tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DeformableDETR"
    dd = cfg.MODEL.DEFORMABLE_DETR
    dd.NUM_CLASSES = 3
    dd.TRANSFORMER.ENC_LAYERS = 2
    dd.TRANSFORMER.DEC_LAYERS = 2
    dd.TRANSFORMER.NUM_QUERIES = 10
    dd.TRANSFORMER.HIDDEN_DIM = 32
    dd.TRANSFORMER.DIM_FEEDFORWARD = 64
    dd.TRANSFORMER.NHEADS = 2
    cfg.TPU.CANVAS = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def detr_variables():
    det = build_detector(detr_tiny_cfg())
    return jax.device_get(jax.jit(det.init_variables)(jax.random.PRNGKey(0)))


def test_detr_roundtrip_full_coverage(detr_variables):
    params = detr_variables["params"]
    frozen = detr_variables["frozen"]
    assert _detect_family(params) == "detr"
    sd, const = _fake_sd_for(params, frozen)
    new_p, new_f = torch_state_dict_to_tree(sd, params, frozen)
    _assert_covered([new_p, new_f], const)


def test_detr_backbone_loads_from_torchvision_names(detr_variables):
    """ImageNet R50 init (torchvision names, no backbone.0.body prefix):
    only the backbone should load; the transformer stays at init."""
    import torch

    params = detr_variables["params"]
    frozen = detr_variables["frozen"]
    sd, const = _fake_sd_for(params, frozen)
    tv_sd = {}
    for k, v in sd.items():
        if k.startswith("backbone.0.body."):
            tv_sd[k[len("backbone.0.body."):]] = v
    assert "layer1.0.conv1.weight" in tv_sd or "conv1.weight" in tv_sd
    new_p, new_f = torch_state_dict_to_tree(tv_sd, params, frozen)
    got = np.asarray(
        flatten_dict(new_p)[("backbone", "stem_conv1", "kernel")])
    np.testing.assert_allclose(got, const["backbone/stem_conv1/kernel"])
    # transformer untouched
    np.testing.assert_allclose(
        np.asarray(flatten_dict(new_p)[("query_embed",)]),
        np.asarray(flatten_dict(params)[("query_embed",)]),
    )


def test_decoder_mha_numeric_parity():
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention via
    the mha_q/k/v/out conversion produces identical outputs."""
    import torch
    import flax.linen as nn

    d, h, b, q = 16, 4, 2, 5
    torch.manual_seed(0)
    m = torch.nn.MultiheadAttention(d, h, batch_first=True)
    x = torch.randn(b, q, d)
    y_t = m(x, x, x, need_weights=False)[0].detach().numpy()

    fl = nn.MultiHeadDotProductAttention(num_heads=h)
    xj = jnp.asarray(x.numpy())
    v0 = fl.init(jax.random.PRNGKey(0), xj, xj, xj)
    flat = dict(flatten_dict(v0["params"]))
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    for inner, tag in (("query", "mha_q"), ("key", "mha_k"),
                       ("value", "mha_v")):
        for leaf, tn in (("kernel", "in_proj_weight"),
                         ("bias", "in_proj_bias")):
            flat[(inner, leaf)] = _convert_array(
                sd[tn], flat[(inner, leaf)], (inner, leaf), tag)
    flat[("out", "kernel")] = _convert_array(
        sd["out_proj.weight"], flat[("out", "kernel")], ("out", "kernel"),
        "mha_out")
    flat[("out", "bias")] = _convert_array(
        sd["out_proj.bias"], flat[("out", "bias")], ("out", "bias"),
        "mha_out")
    from flax.traverse_util import unflatten_dict

    y_j = fl.apply({"params": unflatten_dict(flat)}, xj, xj, xj)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_deconv_numeric_parity():
    """torch ConvTranspose2d -> flax ConvTranspose via the deconv conversion
    (spatial flip + IOHW->HWIO) produces identical outputs."""
    import torch
    import flax.linen as nn

    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = torch.randn(2, 6, 5, 7)
    y_t = m(x).detach().numpy()

    fl = nn.ConvTranspose(4, (2, 2), (2, 2))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    v0 = fl.init(jax.random.PRNGKey(0), xj)
    k = _convert_array(
        m.weight.detach().numpy(), v0["params"]["kernel"],
        ("sfp", "simfp_0_deconv1", "kernel"))
    y_j = fl.apply(
        {"params": {"kernel": k,
                    "bias": jnp.asarray(m.bias.detach().numpy())}}, xj)
    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 3, 1, 2), y_t, atol=1e-5)


def test_sfp_names_covered():
    """Every SimpleFeaturePyramid param maps to a backbone.simfp_* name."""
    from aldi_tpu.engine.checkpoint_convert import _torch_name_for
    from aldi_tpu.models.vit import VIT_CONFIGS
    from tests.test_rcnn_forward import tiny_cfg

    cfg = tiny_cfg(**{
        "MODEL.BACKBONE.NAME": "build_vitdet_b_backbone",
        "MODEL.ROI_BOX_HEAD.NORM": "LN",
        "MODEL.RPN.CONV_DIMS": [-1, -1],
    })
    orig = dict(VIT_CONFIGS["b"])
    VIT_CONFIGS["b"] = dict(embed_dim=64, depth=2, num_heads=2,
                            drop_path_rate=0.0, global_blocks=(1,))
    try:
        det = build_detector(cfg)
        variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    finally:
        VIT_CONFIGS["b"] = orig
    params = jax.device_get(variables["params"])
    missing = [
        "/".join(p) for p in flatten_dict(params)
        if p[0] == "sfp" and _torch_name_for(p, "params") is None
    ]
    assert not missing, missing
    assert _torch_name_for(
        ("sfp", "simfp_0_deconv1", "kernel"), "params"
    ) == "backbone.simfp_2.0.weight"
    assert _torch_name_for(
        ("sfp", "simfp_0_norm2", "scale"), "params"
    ) == "backbone.simfp_2.5.norm.weight"
    assert _torch_name_for(
        ("sfp", "simfp_3_conv1", "kernel"), "params"
    ) == "backbone.simfp_5.1.weight"
