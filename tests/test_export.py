"""Serving export: StableHLO artifact roundtrip.

The reference has no export path (deployment = torch + Detectron2 + the
eval loop, ``/root/reference/tools/train_net.py`` ``--eval-only``); this is
added TPU-native surface. The contract under test:

- ``export_inference`` serializes the full inference flow (preprocess ->
  proposals -> heads -> NMS -> top-k) with the weights baked in,
- ``load_artifact`` reconstructs a callable from the directory alone,
- the artifact's outputs match the live ``forward_inference`` outputs,
- metadata records the canvas/batch contract a serving host needs.
"""

import numpy as np
import jax
import pytest

from aldi_tpu.engine.export import (export_inference, load_artifact,
                                    make_serving_fn, save_artifact)
from aldi_tpu.models import build_detector

from test_rcnn_forward import tiny_cfg, tiny_batch


@pytest.fixture(scope="module")
def exported_dir(tmp_path_factory):
    cfg = tiny_cfg()
    cfg.freeze()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    # cpu-only lowering keeps the test fast; per-platform tracing (the tool
    # default exports cpu AND tpu modules) is covered by
    # test_tpu_module_lowers_from_cpu_host below
    blobs = export_inference(det, variables, batch_size=2, platforms=("cpu",))
    path = tmp_path_factory.mktemp("serving")
    save_artifact(str(path), blobs, det, cfg, 2)
    return str(path), det, variables


def test_artifact_matches_live_inference(exported_dir):
    path, det, variables = exported_dir
    model = load_artifact(path)
    images, sizes, _ = tiny_batch(b=2)
    got = model(np.asarray(images), np.asarray(sizes))
    # jit the live side too: eager op-by-op numerics differ in the last ulp
    # and NMS/top-k tie-breaks amplify that into different box picks
    want = jax.jit(make_serving_fn(det, variables))(images, sizes)
    for k in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_artifact_meta_contract(exported_dir):
    path, det, _ = exported_dir
    model = load_artifact(path)
    m = model.meta
    assert tuple(m["canvas"]) == det.canvas
    assert m["batch_size"] == 2
    assert m["num_classes"] == det.num_classes
    assert m["inputs"]["images"]["shape"] == [2, *det.canvas, 3]


def test_missing_platform_is_loud(exported_dir):
    path, _, _ = exported_dir
    with pytest.raises(ValueError, match="no module for platform"):
        load_artifact(path, platform="tpu")


def test_tpu_module_lowers_from_cpu_host():
    """The tool's default exports a tpu module too; tracing it from this
    CPU-host test env must pick the TPU kernel dispatch (ops/dispatch.py
    force_backend) and lower the Pallas ops without a TPU backend."""
    cfg = tiny_cfg()
    cfg.freeze()
    det = build_detector(cfg)
    variables = jax.jit(det.init_variables)(jax.random.PRNGKey(0))
    blobs = export_inference(det, variables, batch_size=1,
                             platforms=("tpu",))
    assert len(blobs["tpu"]) > 1000


def test_artifact_version_gate(exported_dir, tmp_path):
    import json
    import os
    import shutil

    path, _, _ = exported_dir
    bad = tmp_path / "bad"
    shutil.copytree(path, bad)
    meta = json.load(open(bad / "meta.json"))
    meta["format_version"] = 999
    json.dump(meta, open(bad / "meta.json", "w"))
    with pytest.raises(ValueError, match="format"):
        load_artifact(str(bad))
    assert os.path.exists(path)  # original untouched
