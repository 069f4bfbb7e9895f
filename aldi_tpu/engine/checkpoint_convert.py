"""Reference checkpoint ingestion: torch/D2 name + layout mapping.

Substrate equivalent: fvcore checkpoint loading +
``align_and_update_state_dicts`` (consumed at reference
``aldi/checkpoint.py:4-5``). Maps a torch state dict (D2 module names, OIHW
convs, [out,in] linears, NCHW-flattened FCs) onto this framework's Flax tree
(NHWC/HWIO, FrozenBN stats in the ``frozen`` collection). Non-strict:
missing/unexpected/shape-mismatched keys are logged and skipped, matching
the substrate's incompatible-key handling.
"""

import pickle
from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return sd


def load_d2_pkl_state_dict(path: str) -> dict:
    """D2 model-zoo .pkl: {"model": {name: np.ndarray}, ...}."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return data["model"] if "model" in data else data


def _to_numpy(v):
    if hasattr(v, "numpy"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _torch_name_for(path: Tuple[str, ...], collection: str) -> str:
    """Flax param path -> D2 torch module name (R-CNN family)."""
    parts = list(path)
    top = parts[0]

    def resnet_name(parts):
        # backbone/stem_conv1[_norm]/x  or backbone/res{s}_block{b}/conv{i}[_norm]/x
        name = parts[1]
        leaf = parts[-1]
        if name.startswith("stem_conv1"):
            base = "backbone.bottom_up.stem.conv1"
            if name.endswith("_norm"):
                return f"{base}.norm.{leaf}"
            return f"{base}.{_leafmap(leaf)}"
        stage, block = name.split("_block")
        conv = parts[2]
        base = f"backbone.bottom_up.{stage}.{block}"
        if conv.endswith("_norm"):
            return f"{base}.{conv[:-5]}.norm.{leaf}"
        return f"{base}.{conv}.{_leafmap(leaf)}"

    def _leafmap(leaf):
        # flax: kernel/scale -> torch: weight (LayerNorm/GroupNorm use
        # "scale" in flax)
        return {"kernel": "weight", "scale": "weight", "bias": "bias"}.get(
            leaf, leaf)

    def vit_name(parts):
        # ViTDet trunk: backbone.net.* in the substrate
        # (patch_embed/pos_embed/blocks.N.{norm1,attn,norm2,mlp})
        name = parts[1]
        leaf = parts[-1]
        if name == "patch_embed":
            return f"backbone.net.patch_embed.proj.{_leafmap(leaf)}"
        if name == "pos_embed":
            return "backbone.net.pos_embed"
        if name.startswith("block"):
            i = name[len("block"):]
            sub = parts[2]
            base = f"backbone.net.blocks.{i}"
            if sub in ("norm1", "norm2"):
                return f"{base}.{sub}.{_leafmap(leaf)}"
            if sub == "attn":
                inner = parts[3]
                if inner in ("qkv", "proj"):
                    return f"{base}.attn.{inner}.{_leafmap(leaf)}"
                return f"{base}.attn.{inner}"  # rel_pos_h / rel_pos_w
            if sub == "mlp_fc1":
                return f"{base}.mlp.fc1.{_leafmap(leaf)}"
            if sub == "mlp_fc2":
                return f"{base}.mlp.fc2.{_leafmap(leaf)}"
        return None

    def convnext_name(parts):
        # reference vendored ConvNeXt (aldi/backbone.py:226-355):
        # downsample_layers.{i} = [conv, norm] (i=0) / [norm, conv] (i>0);
        # stages.{i}.{j}.{dwconv,norm,pwconv1,pwconv2,gamma}; out "norm{i}"
        name = parts[1]
        leaf = parts[-1]
        base = "backbone.bottom_up"
        if name.startswith("downsample"):
            i = int(name[len("downsample"):].split("_")[0])
            kind = name.split("_")[1]  # conv | norm
            if i == 0:
                slot = 0 if kind == "conv" else 1
            else:
                slot = 1 if kind == "conv" else 0
            return f"{base}.downsample_layers.{i}.{slot}.{_leafmap(leaf)}"
        if name.startswith("out_norm"):
            return f"{base}.norm{name[len('out_norm'):]}.{_leafmap(leaf)}"
        if name.startswith("stage"):
            stage, block = name[len("stage"):].split("_block")
            sub = parts[2]
            if sub == "gamma":
                return f"{base}.stages.{stage}.{block}.gamma"
            return f"{base}.stages.{stage}.{block}.{sub}.{_leafmap(leaf)}"
        return None

    def sfp_name(parts):
        # SimpleFeaturePyramid: substrate ``backbone.simfp_{stage}`` is an
        # nn.Sequential (detectron2 vit.py); our per-scale module index i in
        # (0..3) maps to stage = i + 2 (stride 4/8/16/32). Sequential slots:
        #   i=0: [deconv, LN, GELU, deconv, conv1x1(+norm), conv3x3(+norm)]
        #   i=1: [deconv, conv1x1(+norm), conv3x3(+norm)]
        #   i=2: [conv1x1(+norm), conv3x3(+norm)]
        #   i=3: [maxpool, conv1x1(+norm), conv3x3(+norm)]
        name = parts[1]  # simfp_{i}_{sub}
        leaf = _leafmap(parts[-1])
        i = int(name[len("simfp_")])
        sub = name[len("simfp_0_"):]
        stage = i + 2
        slots = {
            0: {"deconv1": "0", "ln": "1", "deconv2": "3",
                "conv1": "4", "norm1": "4.norm", "conv2": "5",
                "norm2": "5.norm"},
            1: {"deconv1": "0", "conv1": "1", "norm1": "1.norm",
                "conv2": "2", "norm2": "2.norm"},
            2: {"conv1": "0", "norm1": "0.norm", "conv2": "1",
                "norm2": "1.norm"},
            3: {"conv1": "1", "norm1": "1.norm", "conv2": "2",
                "norm2": "2.norm"},
        }[i]
        slot = slots.get(sub)
        if slot is None:
            return None
        return f"backbone.simfp_{stage}.{slot}.{leaf}"

    if top == "sfp":
        return sfp_name(parts)
    if top == "backbone":
        if parts[1] == "pos_embed" or parts[1].startswith(
            ("patch_embed", "block")
        ):
            return vit_name(parts)
        if parts[1].startswith(("downsample", "stage", "out_norm")):
            return convnext_name(parts)
        return resnet_name(parts)
    if top == "fpn":
        # fpn/lateral{s} -> backbone.fpn_lateral{s}; output{s} ->
        # backbone.fpn_output{s}
        name = parts[1]
        kind = "lateral" if name.startswith("lateral") else "output"
        stage = name[len(kind):]
        return f"backbone.fpn_{kind}{stage}.{_leafmap(parts[-1])}"
    if top == "rpn_head":
        return f"proposal_generator.rpn_head.{parts[1]}.{_leafmap(parts[-1])}"
    if top == "box_head":
        name = parts[1]
        if name.endswith("_norm"):  # convN LayerNorm (ViTDet head config)
            return f"roi_heads.box_head.{name[:-5]}.norm.{_leafmap(parts[-1])}"
        return f"roi_heads.box_head.{name}.{_leafmap(parts[-1])}"
    if top == "box_predictor":
        return f"roi_heads.box_predictor.{parts[1]}.{_leafmap(parts[-1])}"
    if top in ("img_align", "ins_align"):
        # discriminators are torch Sequential; handled separately
        return None
    return None


def _yolo_name_for(path: Tuple[str, ...], collection: str):
    """Flax YOLOv5 param path -> ultralytics state-dict name candidates.

    The reference initializes from ``models/yolov5m_detectron2.pt``
    (``configs/Base-Yolo.yaml:18``), an ultralytics-format YOLOv5 state dict
    wrapped for detectron2; module indices follow the yolov5 yaml layout,
    which our b{i}/n{i}/detect{i} names mirror (models/yolo.py:149-186).
    """
    parts = list(path)
    top = parts[0]
    leaf = parts[-1]
    leafmap = {
        "kernel": "weight", "scale": "weight", "bias": "bias",
        "mean": "running_mean", "var": "running_var",
    }
    if top.startswith("detect"):
        i = int(top[len("detect"):])
        stems = [f"24.m.{i}.{leafmap[leaf]}"]
    elif top[0] in "bn" and top[1:].isdigit():
        idx = int(top[1:])
        # flax nesting: b4/m0/cv1/bn/scale -> model.4.m.0.cv1.bn.weight
        segs = []
        for p in parts[1:-1]:
            if p.startswith("m") and p[1:].isdigit():
                segs.append(f"m.{p[1:]}")
            else:
                segs.append(p)
        stems = [f"{idx}." + ".".join(segs + [leafmap[leaf]])]
    else:
        return None
    # tolerate wrapper-prefix variants: plain ultralytics ("model.24..."),
    # stripped ("24..."), double-wrapped ("model.model.24...")
    return [
        s for base in stems
        for s in ("model." + base, base, "model.model." + base)
    ]


def _detr_name_for(path: Tuple[str, ...], collection: str):
    """Flax Deformable-DETR path -> torch name candidates (+ transform tag).

    Names follow the reference's ``DeformableDETRDetectron2`` submodule,
    which wraps the official Deformable-DETR layout (transformer.encoder/
    decoder.layers.N..., input_proj.N, class_embed.N, bbox_embed.N,
    query_embed, reference_points); the R50 backbone additionally accepts
    plain torchvision ImageNet names (``Base-DETR.yaml:4-5`` auto-loads
    torchvision weights).

    Returns (candidates, tag) where tag in (None, 'deconv', 'mha_q', 'mha_k',
    'mha_v', 'mha_out').
    """
    parts = list(path)
    top = parts[0]
    leaf = parts[-1]
    lm = {"kernel": "weight", "scale": "weight", "bias": "bias",
          "weight": "weight", "running_mean": "running_mean",
          "running_var": "running_var", "mean": "running_mean",
          "var": "running_var"}

    def tv_resnet(parts):
        # our resnet names -> torchvision names (layer{s-1}.{b}.conv{i}/bn{i})
        name = parts[1]
        leaf_t = lm[leaf]
        if name.startswith("stem_conv1"):
            body = "bn1" if name.endswith("_norm") else "conv1"
            return f"{body}.{leaf_t}"
        stage, block = name.split("_block")
        s = int(stage[len("res"):]) - 1
        sub = parts[2]
        if sub.startswith("shortcut"):
            slot = "downsample.1" if sub.endswith("_norm") else "downsample.0"
            return f"layer{s}.{block}.{slot}.{leaf_t}"
        if sub.endswith("_norm"):
            return f"layer{s}.{block}.bn{sub[4]}.{leaf_t}"
        return f"layer{s}.{block}.{sub}.{leaf_t}"

    if top == "backbone":
        body = tv_resnet(parts)
        return [f"backbone.0.body.{body}", body], None
    if top.startswith("input_proj"):
        i = int(top[len("input_proj")].rstrip("_"))
        slot = 1 if top.endswith("_norm") else 0
        return [f"input_proj.{i}.{slot}.{lm[leaf]}"], None
    if top == "level_embed":
        return ["transformer.level_embed"], None
    if top in ("row_embed", "col_embed"):
        # learned position embedding: Joiner index 1 (backbone.0 is the
        # body, backbone.1 the position embedding module)
        return [f"backbone.1.{top}.weight"], None
    if top == "query_embed":
        return ["query_embed.weight"], None
    if top == "reference_points":
        return [f"transformer.reference_points.{lm[leaf]}",
                f"reference_points.{lm[leaf]}"], None
    if top.startswith("class_embed"):
        suffix = top[len("class_embed"):]
        if suffix == "_enc":
            # two-stage encoder head: torch list index dec_layers. Candidates
            # descend so the HIGHEST index present wins — per-layer heads
            # occupy 0..dec_layers-1, so the max index is always the enc
            # head (cap 12 covers any plausible decoder depth; official
            # and reference ship 6)
            return [f"class_embed.{i}.{lm[leaf]}"
                    for i in range(12, 0, -1)], None
        if suffix:  # per-layer head under WITH_BOX_REFINE
            return [f"class_embed.{int(suffix)}.{lm[leaf]}"], None
        return [f"class_embed.0.{lm[leaf]}", f"class_embed.{lm[leaf]}"], None
    if top.startswith("bbox_embed"):
        suffix = top[len("bbox_embed"):]
        i = int(parts[1][1:])  # l{i}
        if suffix == "_enc":
            return [f"bbox_embed.{j}.layers.{i}.{lm[leaf]}"
                    for j in range(12, 0, -1)], None
        if suffix:
            return [f"bbox_embed.{int(suffix)}.layers.{i}.{lm[leaf]}"], None
        return [f"bbox_embed.0.layers.{i}.{lm[leaf]}",
                f"bbox_embed.layers.{i}.{lm[leaf]}"], None
    if top in ("enc_output", "enc_output_norm", "pos_trans",
               "pos_trans_norm"):
        return [f"transformer.{top}.{lm[leaf]}"], None
    if top.startswith(("enc", "dec")):
        is_enc = top.startswith("enc")
        i = int(top[3:])
        base = (
            f"transformer.{'encoder' if is_enc else 'decoder'}.layers.{i}"
        )
        sub = parts[1]
        if sub in ("self_attn", "cross_attn") and parts[2] in (
            "sampling_offsets", "attention_weights", "value_proj",
            "output_proj",
        ):
            return [f"{base}.{sub}.{parts[2]}.{lm[leaf]}"], None
        if sub == "self_attn":  # decoder standard MHA (packed in torch)
            inner = parts[2]  # query | key | value | out
            if inner == "out":
                return [f"{base}.self_attn.out_proj.{lm[leaf]}"], "mha_out"
            proj = f"in_proj_{'weight' if leaf == 'kernel' else 'bias'}"
            return [f"{base}.self_attn.{proj}"], f"mha_{inner[0]}"
        if sub == "ffn":
            inner = parts[2]
            if inner == "norm":
                # post-FFN norm: encoder norm2, decoder norm3
                n = "norm2" if is_enc else "norm3"
                return [f"{base}.{n}.{lm[leaf]}"], None
            return [f"{base}.{inner}.{lm[leaf]}"], None
        if sub.startswith("norm"):
            # ours: norm1 after (cross/self)-attn per deformable-DETR layout
            return [f"{base}.{sub}.{lm[leaf]}"], None
    return None, None


def _convert_array(
    torch_arr: np.ndarray, target: np.ndarray, flax_path: Tuple[str, ...],
    tag: str = None,
) -> np.ndarray:
    """Layout conversion torch -> flax for one leaf."""
    t = _to_numpy(torch_arr)
    leaf = flax_path[-1]
    target = np.asarray(target)
    if leaf == "pos_embed" and t.ndim == 3 and target.ndim == 4:
        # D2/MAE ViT checkpoints store [1, tokens(+cls), D]; the flax param
        # is the grid [1, p, p, D] (class token never used downstream,
        # substrate get_abs_pos strips it the same way)
        p = target.shape[1] * target.shape[2]
        if t.shape[1] == p + 1:
            t = t[:, 1:]
        if t.shape[1] == p:
            t = t.reshape(target.shape)
        return t
    if tag in ("mha_q", "mha_k", "mha_v"):
        # torch packed in_proj [3D, D] / [3D]; flax [D, h, hd] / [h, hd]
        d = t.shape[0] // 3
        sl = {"mha_q": 0, "mha_k": 1, "mha_v": 2}[tag]
        t = t[sl * d:(sl + 1) * d]
        if leaf == "kernel":
            t = t.T.reshape(target.shape)  # [D_in, h, hd]
        else:
            t = t.reshape(target.shape)
        return t
    if tag == "mha_out":
        if leaf == "kernel":  # torch [D_out, h*hd] -> flax [h, hd, D_out]
            return t.T.reshape(target.shape)
        return t
    if len(flax_path) > 2 and flax_path[-3] == "attn":
        # ViT attention head-major DenseGeneral layouts (models/vit.py):
        # torch qkv [3D, D] -> [D, 3, nh, hd]; proj [D, D] -> [nh, hd, D]
        # (torch flattens 3D as (3, nh, hd) and the proj input as (nh, hd))
        if flax_path[-2] == "qkv":
            if leaf == "kernel" and t.ndim == 2 and target.ndim == 4:
                return t.T.reshape(target.shape)
            if leaf == "bias" and t.ndim == 1 and target.ndim == 3:
                return t.reshape(target.shape)
        if flax_path[-2] == "proj" and leaf == "kernel" and target.ndim == 3:
            return t.T.reshape(target.shape)
    if leaf == "kernel" and len(flax_path) > 1 and "deconv" in flax_path[-2]:
        # torch ConvTranspose2d [in, out, kH, kW] -> flax [kH, kW, in, out]
        # with the spatial flip (verified numerically vs torch)
        return t[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    if leaf == "kernel":
        if t.ndim == 4:  # conv OIHW -> HWIO
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:  # linear [out, in] -> [in, out]
            # FCs that directly consume flattened pooled features need the
            # channel-major -> channel-minor permutation
            if (
                flax_path[0] == "box_head"
                and flax_path[1] == "fc1"
                and t.shape[1] == target.shape[0]
                and t.shape[1] % 49 == 0
            ):
                out_dim, in_dim = t.shape
                c = in_dim // 49
                t = (
                    t.reshape(out_dim, c, 7, 7)
                    .transpose(0, 2, 3, 1)
                    .reshape(out_dim, in_dim)
                )
            t = t.T
    return t


def _detect_family(params: dict) -> str:
    tops = set(params.keys())
    if any(t.startswith("detect") for t in tops) or "b0" in tops:
        return "yolo"
    if "query_embed" in tops or "level_embed" in tops:
        return "detr"
    return "rcnn"


def _candidates_for(path, collection, family):
    """-> (list of torch-name candidates, transform tag)."""
    if family == "yolo":
        return (_yolo_name_for(path, collection) or []), None
    if family == "detr":
        names, tag = _detr_name_for(path, collection)
        return (names or []), tag
    name = _torch_name_for(path, collection)
    return ([name] if name else []), None


def torch_state_dict_to_tree(
    sd: Dict[str, np.ndarray], params: dict, frozen: dict,
    model_state: dict = None, logger=None,
):
    """Map a torch/D2/ultralytics/deformable-DETR state dict onto the
    (params, frozen[, model_state]) trees, non-strict: missing / unexpected /
    shape-mismatched keys are logged and skipped (substrate
    incompatible-keys semantics).

    ``model_state`` is the detector's mutable-collections dict (e.g.
    {"batch_stats": ...} for YOLO); pass None to skip. Returns
    (params, frozen) or (params, frozen, model_state) matching the inputs.
    """
    sd = {k: v for k, v in sd.items()}
    family = _detect_family(params)
    new_params = dict(flatten_dict(params))
    new_frozen = dict(flatten_dict(frozen))
    trees = [(new_params, "params"), (new_frozen, "frozen")]
    new_model_state = None
    if model_state:
        new_model_state = {
            coll: dict(flatten_dict(t)) for coll, t in model_state.items()
        }
        for coll, t in new_model_state.items():
            trees.append((t, coll))
    used, missing, mismatched = set(), [], []

    for tree, coll in trees:
        for path, target in list(tree.items()):
            names, tag = _candidates_for(path, coll, family)
            tname = next((n for n in names if n in sd), None)
            if tname is None:
                missing.append("/".join(path))
                continue
            arr = _convert_array(sd[tname], np.asarray(target), path, tag)
            if arr.shape != np.asarray(target).shape:
                mismatched.append(
                    f"{'/'.join(path)}: ckpt {arr.shape} vs model "
                    f"{np.asarray(target).shape}"
                )
                continue
            tree[path] = arr.astype(np.asarray(target).dtype)
            used.add(tname)

    if logger:
        unused = [k for k in sd if k not in used]
        if missing:
            logger.info(
                f"checkpoint ({family}): {len(missing)} model keys not found "
                f"in checkpoint (first 10: {missing[:10]})"
            )
        if mismatched:
            logger.info(f"checkpoint: shape mismatches skipped: {mismatched}")
        if unused:
            logger.info(
                f"checkpoint: {len(unused)} checkpoint keys unused "
                f"(first 10: {unused[:10]})"
            )
    out_p, out_f = unflatten_dict(new_params), unflatten_dict(new_frozen)
    if new_model_state is None:
        return out_p, out_f
    return out_p, out_f, {
        coll: unflatten_dict(t) for coll, t in new_model_state.items()
    }
