"""Torch forward-parity oracles + golden D2 name lists (VERDICT r2 #1).

Breaks the converter-name-map circularity of test_checkpoint_convert.py
(which builds its fake state dict FROM ``_torch_name_for``): here the
state dict comes from an independent torch transcription whose module tree
carries the exact detectron2 names (tests/torch_rcnn_oracle.py), and the
converted Flax forward must match the torch forward numerically. Green
means a real reference ``.pkl``/``.pth`` R50-FPN checkpoint loads with
zero skipped backbone/head keys and produces matching activations.
Reference load path: ``aldi/checkpoint.py:18-32``,
``configs/detectron2/Base-RCNN-FPN.yaml:3-4``.
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
from aldi_tpu.models import build_detector
from tests.test_rcnn_forward import tiny_cfg
from tests.torch_rcnn_oracle import (
    backbone_forward,
    box_head_forward,
    build_r50_fpn_rcnn,
    golden_d2_r50_fpn_names,
    randomize,
    rpn_forward,
)

torch = pytest.importorskip("torch")


def r50_cfg():
    return tiny_cfg(**{
        "MODEL.RESNETS.DEPTH": 50,
        # 1 size/level (A=3), the flagship anchor layout
        "MODEL.ANCHOR_GENERATOR.SIZES": [[32], [64], [128], [256], [512]],
        "TPU.CANVAS": (64, 64),
    })


@pytest.fixture(scope="module")
def converted():
    """torch oracle (random weights) -> D2 state dict -> converter ->
    Flax trees. Returns (torch_root, flax_variables, detector)."""
    root = randomize(build_r50_fpn_rcnn(num_classes=3, num_anchors=3),
                     seed=11)
    sd = root.state_dict()

    det = build_detector(r50_cfg())
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    params = jax.device_get(variables["params"])
    frozen = jax.device_get(variables["frozen"])
    new_params, new_frozen = torch_state_dict_to_tree(sd, params, frozen)
    return root, {"params": new_params, "frozen": new_frozen}, det


def test_name_map_matches_golden_d2_names():
    """Every Flax param/frozen path must map to a name in the structurally
    transcribed golden D2 key set, and the map must cover that set exactly
    — a wrong or missing entry in ``_torch_name_for`` fails here even
    though the circular round-trip test would pass."""
    det = build_detector(r50_cfg())
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    golden = golden_d2_r50_fpn_names()

    produced = set()
    unmapped = []
    for coll in ("params", "frozen"):
        for path in flatten_dict(jax.device_get(variables[coll])):
            name = _torch_name_for(path, coll)
            if name is None:
                unmapped.append("/".join(path))
            else:
                produced.add(name)
    assert not unmapped, f"paths with no D2 name: {unmapped}"
    missing_from_golden = sorted(produced - golden)
    not_produced = sorted(golden - produced)
    assert not missing_from_golden, (
        f"converter produces names detectron2 never uses: "
        f"{missing_from_golden[:10]}"
    )
    assert not not_produced, (
        f"D2 checkpoint keys no Flax param maps to (would be silently "
        f"skipped on load): {not_produced[:10]}"
    )


def test_converter_consumes_oracle_state_dict_fully(converted):
    """Against the oracle's real-shaped state dict: zero model keys
    missing, zero checkpoint keys unused (the 'silently skipped weights'
    failure mode)."""
    root, variables, det = converted
    sd = root.state_dict()
    init = jax.jit(det.init_variables)(jax.random.PRNGKey(0))

    # every leaf must have been overwritten by checkpoint values
    untouched = []
    for coll in ("params", "frozen"):
        flat_new = flatten_dict(variables[coll])
        flat_old = flatten_dict(jax.device_get(init[coll]))
        for path in flat_new:
            if np.array_equal(
                np.asarray(flat_new[path]), np.asarray(flat_old[path])
            ):
                untouched.append("/".join(path))
    assert not untouched, f"leaves not loaded from checkpoint: {untouched}"

    # and every checkpoint key must be consumed by some leaf
    used = set()
    for coll in ("params", "frozen"):
        for path in flatten_dict(variables[coll]):
            name = _torch_name_for(path, coll)
            if name:
                used.add(name)
    unused = sorted(set(sd) - used)
    assert not unused, f"checkpoint keys unused: {unused[:10]}"


def test_backbone_fpn_forward_matches_torch(converted):
    root, variables, det = converted
    rng = np.random.RandomState(3)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    ours = jax.jit(lambda v, im: det.backbone(v, im))(
        variables, jnp.asarray(x)
    )  # list p2..p6, NHWC
    theirs = backbone_forward(root, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for i, level in enumerate(("p2", "p3", "p4", "p5", "p6")):
        want = theirs[level].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(ours[i]), want, rtol=1e-3, atol=1e-4,
            err_msg=level,
        )


def test_rpn_head_forward_matches_torch(converted):
    root, variables, det = converted
    rng = np.random.RandomState(5)
    feats_np = [
        rng.randn(1, s, s, 256).astype(np.float32) for s in (16, 8, 4)
    ]
    ours_logits, ours_deltas = jax.jit(
        lambda v, f: det.rpn_head(v, f)
    )(variables, [jnp.asarray(f) for f in feats_np])
    t_logits, t_deltas = rpn_forward(
        root, [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats_np]
    )
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(ours_logits[lvl]), t_logits[lvl].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"logits level {lvl}",
        )
        np.testing.assert_allclose(
            np.asarray(ours_deltas[lvl]), t_deltas[lvl].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"deltas level {lvl}",
        )


def test_box_head_forward_matches_torch(converted):
    """The fc1 NCHW-flatten permutation (checkpoint_convert.py:337-349) is
    exactly where a silent layout bug would hide: torch flattens [N,C,7,7]
    channel-major, Flax flattens [N,7,7,C] channel-minor."""
    root, variables, det = converted
    rng = np.random.RandomState(7)
    pooled = rng.randn(4, 7, 7, 256).astype(np.float32)

    from aldi_tpu.models.rcnn import RCNN

    cls, reg, _ = jax.jit(
        lambda v, p: det.module.apply(v, p, method=RCNN.box_fwd)
    )(variables, jnp.asarray(pooled)[None])  # [B=1, S=4, 7, 7, C]
    t_cls, t_reg = box_head_forward(
        root, torch.from_numpy(pooled.transpose(0, 3, 1, 2))
    )
    np.testing.assert_allclose(
        np.asarray(cls[0]), t_cls.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(reg[0]), t_reg.numpy(), rtol=1e-4, atol=1e-5
    )
