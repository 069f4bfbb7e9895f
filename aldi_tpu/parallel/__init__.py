from .mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, shard_state, tp_spec,
)
