"""Torch forward-parity oracle for the YOLOv5 family (reference wrapper
submodule surface, ``configs/Base-Yolo.yaml:4-18``: ultralytics-format
``model.{idx}.*`` state dict loaded through the converter).

Three layers of evidence, mirroring tests/test_torch_parity.py:
1. the converter's name map emits exactly the hand-enumerated golden
   ultralytics names (no generation from the map under test);
2. a randomized torch state dict converts with zero untouched leaves
   (params AND batch_stats);
3. the flax forward matches the independent torch transcription to f32
   tolerance on random inputs, per level.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.traverse_util import flatten_dict

from aldi_tpu.engine.checkpoint_convert import (
    _yolo_name_for,
    torch_state_dict_to_tree,
)
from aldi_tpu.models.yolo import YOLOv5
from tests.torch_rcnn_oracle import randomize
from tests.torch_yolo_oracle import (
    build_yolov5,
    golden_ultralytics_names,
    yolo_forward,
)

torch = pytest.importorskip("torch")

# yolov5n multiples (models/yolo.py MULTIPLES): the real smallest variant
NC, DM, WM = 4, 0.33, 0.25


def flax_yolo():
    return YOLOv5(num_classes=NC, depth_mult=DM, width_mult=WM)


@pytest.fixture(scope="module")
def converted():
    root = randomize(build_yolov5(NC, DM, WM), seed=7)
    net = flax_yolo()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: net.init(k, x, False))(
        jax.random.PRNGKey(0), x0)
    params = jax.device_get(variables["params"])
    bstats = jax.device_get(variables["batch_stats"])
    new_params, _, new_state = torch_state_dict_to_tree(
        root.state_dict(), params, {}, {"batch_stats": bstats})
    return root, net, {"params": new_params,
                       "batch_stats": new_state["batch_stats"]}


def test_yolo_name_map_matches_golden():
    golden = golden_ultralytics_names(DM, WM)
    net = flax_yolo()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.device_get(jax.jit(
        lambda k, x: net.init(k, x, False))(jax.random.PRNGKey(0), x0))
    produced = set()
    for coll in ("params", "batch_stats"):
        for path in flatten_dict(variables[coll]):
            cands = _yolo_name_for(path, coll)
            assert cands, f"no torch name for {path}"
            hit = next((c for c in cands if c in golden), None)
            assert hit is not None, f"{path} -> {cands} not in golden"
            produced.add(hit)
    assert produced == golden
    # the oracle module itself carries exactly the golden names too
    root = build_yolov5(NC, DM, WM)
    sd = {k for k in root.state_dict() if "num_batches_tracked" not in k}
    assert sd == golden


def test_yolo_converter_consumes_fully(converted):
    root, net, variables = converted
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init = jax.device_get(jax.jit(
        lambda k, x: net.init(k, x, False))(jax.random.PRNGKey(0), x0))
    for coll in ("params", "batch_stats"):
        flat_new = flatten_dict(variables[coll])
        flat_old = flatten_dict(init[coll])
        untouched = [
            "/".join(p) for p in flat_new
            if np.array_equal(np.asarray(flat_new[p]),
                              np.asarray(flat_old[p]))
        ]
        assert not untouched, f"{coll} leaves not loaded: {untouched}"


def test_yolo_forward_matches_torch(converted):
    root, net, variables = converted
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    want = yolo_forward(root, torch.from_numpy(x).permute(0, 3, 1, 2))
    got, _ = jax.jit(lambda v, x: net.apply(v, x, False))(
        variables, jnp.asarray(x))
    assert len(got) == 3
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(got[lvl]), want[lvl].numpy(),
            rtol=5e-4, atol=5e-4, err_msg=f"P{lvl + 3}")
