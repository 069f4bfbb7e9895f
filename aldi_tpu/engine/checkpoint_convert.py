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
    """Flax param path -> D2 torch module name."""
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


def _convert_array(
    torch_arr: np.ndarray, target: np.ndarray, flax_path: Tuple[str, ...]
) -> np.ndarray:
    """Layout conversion torch -> flax for one leaf."""
    t = _to_numpy(torch_arr)
    leaf = flax_path[-1]
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


def torch_state_dict_to_tree(
    sd: Dict[str, np.ndarray], params: dict, frozen: dict, logger=None
) -> Tuple[dict, dict]:
    """Map a torch/D2 state dict onto (params, frozen) trees, non-strict."""
    sd = {k: v for k, v in sd.items()}
    new_params = dict(flatten_dict(params))
    new_frozen = dict(flatten_dict(frozen))
    used, missing, mismatched = set(), [], []

    for tree, is_frozen in ((new_params, False), (new_frozen, True)):
        for path, target in list(tree.items()):
            tname = _torch_name_for(path, "frozen" if is_frozen else "params")
            if tname is None or tname not in sd:
                missing.append("/".join(path))
                continue
            arr = _convert_array(sd[tname], np.asarray(target), path)
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
                f"checkpoint: {len(missing)} model keys not found in "
                f"checkpoint (first 10: {missing[:10]})"
            )
        if mismatched:
            logger.info(f"checkpoint: shape mismatches skipped: {mismatched}")
        if unused:
            logger.info(
                f"checkpoint: {len(unused)} checkpoint keys unused "
                f"(first 10: {unused[:10]})"
            )
    return unflatten_dict(new_params), unflatten_dict(new_frozen)
