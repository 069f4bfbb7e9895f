"""Torch forward-parity oracles for the ViTDet family (trunk + SFP).

Extends the R50-FPN oracle pattern (test_torch_parity.py) to the ViT
checkpoint path: the reference loads MAE-pretrained / ViTDet ``.pkl`` files
through the same D2 name space (``aldi/backbone.py:37-64``,
``configs/Base-RCNN-VitDetB.yaml``), where ``pos_embed`` carries the
MAE class token — a layout the converter must strip, not silently skip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from aldi_tpu.engine.checkpoint_convert import (
    _torch_name_for,
    torch_state_dict_to_tree,
)
from aldi_tpu.models.vit import SimpleFeaturePyramid, ViT
from tests.torch_rcnn_oracle import randomize
from tests.torch_vit_oracle import (
    build_sfp,
    build_vit_trunk,
    golden_d2_sfp_names,
    golden_d2_vit_names,
    sfp_forward,
    vit_forward,
)

torch = pytest.importorskip("torch")

DIM, DEPTH, HEADS, WINDOW = 32, 3, 2, 4
GLOBAL = (1,)
IMG = 128  # 8x8 token grid at patch 16 == pretrain grid (no pos interp)


def flax_vit():
    return ViT(
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, patch_size=16,
        window_size=WINDOW, global_blocks=GLOBAL, drop_path_rate=0.0,
        pretrain_img_size=IMG, use_act_checkpoint=False,
    )


@pytest.fixture(scope="module")
def converted_trunk():
    """torch oracle (random weights, cls-token pos_embed) -> D2 state dict
    -> converter -> flax ViT params."""
    root = randomize(
        build_vit_trunk(DIM, DEPTH, HEADS, 16, WINDOW, GLOBAL,
                        pretrain_grid=IMG // 16, use_cls_token=True),
        seed=5,
    )
    vit = flax_vit()
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = jax.jit(vit.init)(jax.random.PRNGKey(0), x0)
    params = jax.device_get(variables["params"])
    new_params, _ = torch_state_dict_to_tree(
        root.state_dict(), {"backbone": params}, {})
    return root, vit, {"params": new_params["backbone"]}


def test_vit_name_map_matches_golden():
    vit = flax_vit()
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    params = jax.device_get(
        jax.jit(vit.init)(jax.random.PRNGKey(0), x0)["params"])
    produced = set()
    for path in flatten_dict({"backbone": params}):
        name = _torch_name_for(path, "params")
        assert name is not None, f"no torch name for {path}"
        produced.add(name)
    assert produced == golden_d2_vit_names(DEPTH)
    # the oracle state dict is exactly the golden set too (independent
    # construction on both sides)
    root = build_vit_trunk(DIM, DEPTH, HEADS, 16, WINDOW, GLOBAL,
                           pretrain_grid=IMG // 16, use_cls_token=True)
    assert set(root.state_dict()) == golden_d2_vit_names(DEPTH)


def test_vit_converter_consumes_fully_and_strips_cls_token(converted_trunk):
    root, vit, variables = converted_trunk
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    init = jax.device_get(
        jax.jit(vit.init)(jax.random.PRNGKey(0), x0)["params"])
    flat_new = flatten_dict(variables["params"])
    flat_old = flatten_dict(init)
    untouched = [
        "/".join(p) for p in flat_new
        if np.array_equal(np.asarray(flat_new[p]), np.asarray(flat_old[p]))
    ]
    assert not untouched, f"leaves not loaded: {untouched}"
    # pos_embed: [1, 65, D] with cls token -> [1, 8, 8, D] grid
    pos_t = root.backbone.net.pos_embed.detach().numpy()
    got = np.asarray(flat_new[("pos_embed",)])
    np.testing.assert_array_equal(
        got, pos_t[:, 1:].reshape(1, IMG // 16, IMG // 16, DIM))


def test_vit_trunk_forward_matches_torch(converted_trunk):
    root, vit, variables = converted_trunk
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32)
    want = vit_forward(root, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        jax.jit(lambda v, x: vit.apply(v, x, False))(
            variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vit_l_forward_matches_torch():
    """ViT-L parity at the REAL L geometry: depth 24, embed 1024, heads 16,
    window 14, global-attention blocks (5, 11, 17, 23) — the reference's
    ``build_vitdet_l_backbone`` overrides (``aldi/backbone.py:50-58``,
    matched by ``models/vit.py::VIT_CONFIGS['l']``). Run at 224x224 (14x14
    token grid == pretrain grid: no pos-embed interpolation, and the global
    blocks' rel-pos tables index the full grid as in a real L checkpoint)."""
    from aldi_tpu.models.vit import VIT_CONFIGS

    lcfg = VIT_CONFIGS["l"]
    assert lcfg["depth"] == 24 and lcfg["embed_dim"] == 1024
    assert lcfg["num_heads"] == 16
    assert tuple(lcfg["global_blocks"]) == (5, 11, 17, 23)
    img = 224
    root = randomize(
        build_vit_trunk(
            lcfg["embed_dim"], lcfg["depth"], lcfg["num_heads"], 16,
            window_size=14, global_blocks=tuple(lcfg["global_blocks"]),
            pretrain_grid=img // 16, use_cls_token=True,
        ),
        seed=11,
    )
    assert set(root.state_dict()) == golden_d2_vit_names(lcfg["depth"])
    vit = ViT(
        embed_dim=lcfg["embed_dim"], depth=lcfg["depth"],
        num_heads=lcfg["num_heads"], patch_size=16, window_size=14,
        global_blocks=tuple(lcfg["global_blocks"]), drop_path_rate=0.0,
        pretrain_img_size=img, use_act_checkpoint=False,
    )
    x0 = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = jax.jit(vit.init)(jax.random.PRNGKey(0), x0)
    params = jax.device_get(variables["params"])
    produced = {
        _torch_name_for(p, "params") for p in flatten_dict({"backbone": params})
    }
    assert produced == golden_d2_vit_names(lcfg["depth"])
    new_params, _ = torch_state_dict_to_tree(
        root.state_dict(), {"backbone": params}, {})
    flat_new = flatten_dict(new_params["backbone"])
    flat_old = flatten_dict(params)
    untouched = [
        "/".join(p) for p in flat_new
        if np.array_equal(np.asarray(flat_new[p]), np.asarray(flat_old[p]))
    ]
    assert not untouched, f"leaves not loaded: {untouched}"
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, img, img, 3)).astype(np.float32)
    want = vit_forward(root, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        jax.jit(lambda v, x: vit.apply(v, x, False))(
            {"params": new_params["backbone"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_sfp_forward_matches_torch():
    root = randomize(build_sfp(DIM, out_channels=16), seed=9)
    assert set(root.state_dict()) == golden_d2_sfp_names()
    sfp = SimpleFeaturePyramid(out_channels=16)
    rng = np.random.default_rng(1)
    trunk = rng.normal(size=(2, 8, 8, DIM)).astype(np.float32)
    variables = jax.jit(sfp.init)(jax.random.PRNGKey(0), jnp.asarray(trunk))
    params = jax.device_get(variables["params"])
    produced = {
        _torch_name_for(p, "params") for p in flatten_dict({"sfp": params})
    }
    assert produced == golden_d2_sfp_names()
    new_params, _ = torch_state_dict_to_tree(
        root.state_dict(), {"sfp": params}, {})
    got = jax.jit(sfp.apply)(
        {"params": new_params["sfp"]}, jnp.asarray(trunk))
    want = sfp_forward(root, torch.from_numpy(trunk))
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        np.testing.assert_allclose(
            np.asarray(got[lvl]),
            want[lvl].permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=lvl)
