"""Device mesh + sharding helpers.

Substrate equivalent: the reference's DDP/NCCL launch stack
(``tools/train_net.py:90-98``, ``aldi/dropin.py:53``; SURVEY.md section 2.6). Here
data parallelism is a 1-D ``jax.sharding.Mesh``: the batch is sharded on the
``data`` axis, model/optimizer/EMA state is replicated, and XLA inserts the
gradient all-reduce over ICI. No process groups, no gradient hooks, no
DDP-unwrapping — one program.
"""

from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    n = n_devices or len(jax.devices())
    devices = mesh_utils.create_device_mesh((n,))
    return Mesh(devices, ("data",))


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
