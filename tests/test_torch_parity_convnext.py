"""Torch forward-parity oracle for the ConvNeXt backbone family
(reference vendored ConvNeXt, ``aldi/backbone.py:155-355``; loaded through
``aldi/checkpoint.py:18-32`` with ``backbone.bottom_up.*`` names)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from aldi_tpu.engine.checkpoint_convert import (
    _torch_name_for,
    torch_state_dict_to_tree,
)
from aldi_tpu.models.convnext import ConvNeXt
from tests.torch_rcnn_oracle import randomize
from tests.torch_convnext_oracle import (
    build_convnext,
    convnext_forward,
    golden_d2_convnext_names,
)

torch = pytest.importorskip("torch")

DEPTHS, DIMS = (1, 1, 2, 1), (8, 16, 32, 64)


def flax_convnext():
    return ConvNeXt(depths=DEPTHS, dims=DIMS, drop_path_rate=0.0)


@pytest.fixture(scope="module")
def converted():
    root = randomize(build_convnext(DEPTHS, DIMS), seed=13)
    net = flax_convnext()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x0)
    params = jax.device_get(variables["params"])
    new_params, _ = torch_state_dict_to_tree(
        root.state_dict(), {"backbone": params}, {})
    return root, net, {"params": new_params["backbone"]}


def test_convnext_name_map_matches_golden():
    net = flax_convnext()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.device_get(
        jax.jit(net.init)(jax.random.PRNGKey(0), x0)["params"])
    produced = set()
    for path in flatten_dict({"backbone": params}):
        name = _torch_name_for(path, "params")
        assert name is not None, f"no torch name for {path}"
        produced.add(name)
    assert produced == golden_d2_convnext_names(DEPTHS)
    root = build_convnext(DEPTHS, DIMS)
    assert set(root.state_dict()) == golden_d2_convnext_names(DEPTHS)


def test_convnext_converter_consumes_fully(converted):
    root, net, variables = converted
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.device_get(
        jax.jit(net.init)(jax.random.PRNGKey(0), x0)["params"])
    flat_new = flatten_dict(variables["params"])
    flat_old = flatten_dict(init)
    untouched = [
        "/".join(p) for p in flat_new
        if np.array_equal(np.asarray(flat_new[p]), np.asarray(flat_old[p]))
    ]
    assert not untouched, f"leaves not loaded: {untouched}"


def test_convnext_forward_matches_torch(converted):
    root, net, variables = converted
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    want = convnext_forward(root, torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jax.jit(lambda v, x: net.apply(v, x, False))(
        variables, jnp.asarray(x))
    for lvl in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(got[lvl]),
            want[lvl].permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=lvl)
