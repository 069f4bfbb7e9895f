"""Serving export: freeze the inference path into portable StableHLO
artifacts.

The reference stack has no deployment story beyond "run the torch model
under Detectron2's eval loop" (``/root/reference/tools/train_net.py``
``--eval-only``); serving it means shipping torch + Detectron2 + the model
zoo checkpoint. Here the student inference path (the exact flow the
evaluator drives: preprocess -> backbone -> proposals -> heads -> score
threshold -> class-aware NMS -> top-k) is exported with ``jax.export``:

- weights are baked in as constants (no checkpoint needed at serving time),
- shapes are static (batch x canvas fixed at export time, matching the
  padded-canvas contract the whole framework uses),
- ONE module per target platform (cpu and tpu by default): kernel dispatch
  is a trace-time decision (Pallas on tpu, XLA elsewhere —
  ``ops/dispatch.py``), so each platform gets the module its compiler can
  lower, traced under ``force_backend``,
- loading needs only ``jax`` — none of this package's Python.

Artifact layout (a directory):
    serving.<platform>.stablehlo   jax.export serialized bytes per platform
    meta.json                      canvas/batch/class-count/IO spec
"""

import json
import os

import numpy as np

__all__ = ["make_serving_fn", "export_inference", "save_artifact",
           "load_artifact", "ServingModel"]

_META_NAME = "meta.json"

# bump when the exported calling convention (inputs/outputs) changes
_FORMAT_VERSION = 2


def _module_name(platform):
    return f"serving.{platform}.stablehlo"


def make_serving_fn(det, variables):
    """Close the detector's inference path over fixed variables.

    Returns ``fn(images[B,H,W,3] f32, sizes[B,2] i32) -> dict`` with plain
    array outputs (boxes [B,N,4] xyxy on the canvas, scores [B,N],
    classes [B,N] i32, valid [B,N] bool) — no package pytrees in the
    signature, so the artifact is loadable without aldi_tpu installed.
    """

    def fn(images, sizes):
        boxes, scores, classes, valid = det.forward_inference(
            variables, images, sizes)
        return {"boxes": boxes, "scores": scores, "classes": classes,
                "valid": valid}

    return fn


def export_inference(det, variables, batch_size,
                     platforms=("cpu", "tpu")):
    """Export the inference path: ``{platform: serialized bytes}``.

    Each platform is traced under ``force_backend(platform)`` so "auto"
    kernel dispatch (ROIAlign pool mode, flash attention, Pallas matcher)
    resolves to what that platform's compiler can lower — a cpu module from
    a tpu host and vice versa both work. Explicit non-auto pool modes are
    honored as configured and will fail loudly if the target platform
    cannot lower them.
    """
    import jax
    from jax import export as jax_export

    from ..ops.dispatch import force_backend

    h, w = det.canvas
    fn = make_serving_fn(det, variables)
    out = {}
    for platform in platforms:
        with force_backend(platform):
            exported = jax_export.export(
                jax.jit(fn), platforms=(platform,))(
                jax.ShapeDtypeStruct((batch_size, h, w, 3), np.float32),
                jax.ShapeDtypeStruct((batch_size, 2), np.int32),
            )
        out[platform] = exported.serialize()
    return out


def save_artifact(path, blobs, det, cfg, batch_size):
    """Write the per-platform modules + host-side metadata to ``path``."""
    os.makedirs(path, exist_ok=True)
    for platform, blob in blobs.items():
        with open(os.path.join(path, _module_name(platform)), "wb") as f:
            f.write(blob)
    h, w = det.canvas
    # The exported graph bakes in the detector's preprocess (mean/std in the
    # configured channel order), so the serving host must feed pixels in
    # cfg.INPUT.FORMAT — BGR for the default/flagship Caffe-style configs.
    input_format = cfg.INPUT.FORMAT
    meta = {
        "format_version": _FORMAT_VERSION,
        "canvas": [int(h), int(w)],
        "batch_size": int(batch_size),
        "num_classes": int(det.num_classes),
        "meta_architecture": cfg.MODEL.META_ARCHITECTURE,
        "input_format": input_format,
        "platforms": sorted(blobs),
        "inputs": {
            "images": {"shape": [batch_size, h, w, 3], "dtype": "float32",
                       "note": f"0-255 {input_format}, padded bottom/right "
                               "to canvas"},
            "sizes": {"shape": [batch_size, 2], "dtype": "int32",
                      "note": "valid (h, w) per image before padding"},
        },
        "outputs": {
            "boxes": "xyxy on the canvas; rescale by original/canvas ratio",
            "scores": "post-sigmoid/softmax detection scores",
            "classes": "contiguous class ids",
            "valid": "detection mask (padded rows are False)",
        },
    }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1)


class ServingModel:
    """A loaded artifact: ``model(images, sizes) -> dict`` plus its meta."""

    def __init__(self, exported, meta, platform):
        import jax

        self._exported = exported
        self.meta = meta
        self.platform = platform
        # jit once: a per-call wrapper would retrace/recompile the whole
        # serving module on every request
        self._call = jax.jit(exported.call)

    def __call__(self, images, sizes):
        return self._call(images, sizes)


def load_artifact(path, platform=None):
    """Load an exported artifact directory for ``platform`` (default: the
    live backend). Only needs jax at serving time."""
    import jax
    from jax import export as jax_export

    with open(os.path.join(path, _META_NAME)) as f:
        meta = json.load(f)
    if meta.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"artifact format {meta.get('format_version')} != "
            f"supported {_FORMAT_VERSION}"
        )
    platform = platform or jax.default_backend()
    if platform not in meta["platforms"]:
        raise ValueError(
            f"artifact has no module for platform {platform!r} "
            f"(available: {meta['platforms']})"
        )
    with open(os.path.join(path, _module_name(platform)), "rb") as f:
        exported = jax_export.deserialize(f.read())
    return ServingModel(exported, meta, platform)
