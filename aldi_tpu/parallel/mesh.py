"""Device mesh + sharding helpers.

Substrate equivalent: the reference's DDP/NCCL launch stack
(``tools/train_net.py:90-98``, ``aldi/dropin.py:53``; SURVEY.md section 2.6). Here
data parallelism is a 1-D ``jax.sharding.Mesh``: the batch is sharded on the
``data`` axis, model/optimizer/EMA state is replicated, and XLA inserts the
gradient all-reduce over ICI. No process groups, no gradient hooks, no
DDP-unwrapping — one program.

Beyond the reference (which is DP-only, SURVEY section 2.6): an opt-in
``model`` mesh axis (``TPU.MESH_MODEL``) Megatron-shards the MLP/FFN
expand-contract matmuls — the FLOPs-dominant pair in ViT blocks, ConvNeXt
blocks, DETR transformer layers, and the R-CNN box head. The expand kernel
is column-parallel (output features sharded, bias sharded), the contract
kernel row-parallel (input features sharded); GSPMD keeps the hidden
activation sharded between them and inserts ONE all-reduce after the
contract, all over ICI. Attention/conv trunk weights stay replicated (their
per-chip sizes are modest at ViT-L and below); optimizer/EMA state follows
the param shardings automatically because the rules match on path suffixes
that appear unchanged inside the optax state pytrees.
"""

import re
from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    n = n_devices or len(jax.devices())
    if model_parallel <= 1:
        if n < len(jax.devices()):
            # subset mesh (e.g. a 1-device control run next to an n-device
            # run in the same process): create_device_mesh requires using
            # every device, so slice the device list directly
            import numpy as np

            devices = np.asarray(jax.devices()[:n])
        else:
            devices = mesh_utils.create_device_mesh((n,))
        return Mesh(devices, ("data",))
    if n % model_parallel:
        raise ValueError(
            f"{n} devices not divisible by TPU.MESH_MODEL={model_parallel}")
    devices = mesh_utils.create_device_mesh((n // model_parallel,
                                             model_parallel))
    return Mesh(devices, ("data", "model"))


# Megatron MLP pair: expand (column-parallel) / contract (row-parallel).
# ViT mlp_fc1/mlp_fc2; ConvNeXt pwconv1/pwconv2; DETR FFN linear1/linear2;
# R-CNN box head fc1/fc2 (all flax Dense: kernel [in, out]).
_TP_EXPAND = re.compile(r"(^|/)(mlp_fc1|pwconv1|linear1|fc1)/(kernel|bias)$")
_TP_CONTRACT = re.compile(r"(^|/)(mlp_fc2|pwconv2|linear2|fc2)/kernel$")
# ViT attention, head-major DenseGeneral layouts (models/vit.py):
# qkv kernel [C, 3, nh, hd] / bias [3, nh, hd] shard nh (column-parallel);
# proj kernel [nh, hd, D] contracts nh+hd (row-parallel, one all-reduce).
_TP_ATTN_QKV = re.compile(r"(^|/)attn/qkv/(kernel|bias)$")
_TP_ATTN_PROJ = re.compile(r"(^|/)attn/proj/kernel$")


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tp_spec(path, leaf, model_size: int):
    """PartitionSpec for one state leaf under the ``model`` axis; P() when
    no rule matches or the sharded dim does not divide."""
    name = _path_str(path)
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if _TP_EXPAND.search(name) and ndim >= 1:
        if shape[-1] % model_size == 0:
            return P(*([None] * (ndim - 1) + ["model"]))
    elif _TP_CONTRACT.search(name) and ndim == 2:
        if shape[0] % model_size == 0:
            return P("model", None)
    elif _TP_ATTN_QKV.search(name):
        # kernel [C, 3, nh, hd] / bias [3, nh, hd]: nh is dim -2
        if ndim in (3, 4) and shape[-2] % model_size == 0:
            return P(*([None] * (ndim - 2) + ["model", None]))
    elif _TP_ATTN_PROJ.search(name):
        if ndim == 3 and shape[0] % model_size == 0:
            return P("model", None, None)
    return P()


# Leaves below this element count stay replicated under FSDP: sharding a
# tiny bias trades an all-gather per use for a few KB of savings.
_FSDP_MIN_ELEMS = 1 << 16


def fsdp_spec(leaf, data_size: int):
    """ZeRO-style spec: shard the largest divisible dim of a big leaf over
    the ``data`` axis (GSPMD all-gathers the weight at each use and
    reduce-scatters its gradient — the standard FSDP expression on TPU).
    Returns P() for small or indivisible leaves."""
    shape = getattr(leaf, "shape", ())
    size = getattr(leaf, "size", 0)
    if size < _FSDP_MIN_ELEMS:
        return P()
    best = -1
    for i, d in enumerate(shape):
        if d % data_size == 0 and (best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return P()
    return P(*[("data" if i == best else None) for i in range(len(shape))])


def shard_state(tree, mesh: Mesh, fsdp: bool = False):
    """Place a train-state pytree on the mesh: tensor-parallel leaves get
    their Megatron spec; with ``fsdp`` every other big leaf (params,
    optimizer moments, EMA) is ZeRO-sharded over the data axis; the rest
    is replicated. On a pure-DP mesh without fsdp this is exactly
    ``replicate``."""
    has_model = "model" in mesh.axis_names
    if not has_model and not fsdp:
        return replicate(tree, mesh)
    m = mesh.shape["model"] if has_model else 1
    d = mesh.shape["data"]

    def put(path, x):
        spec = tp_spec(path, x, m) if has_model else P()
        if fsdp and spec == P():
            spec = fsdp_spec(x, d)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def shard_batch(batch, mesh: Mesh):
    """Shard every array leaf on its leading (batch) dim. Zero-size leaves
    (absent streams) are replicated."""

    def put(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] > 0:
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
