"""EMA teacher as a pure pytree operation inside the jitted step.

Replaces the reference's module-copy EMA (``aldi/ema.py``): per-step blend
``t = s*(1-alpha) + t*alpha`` (``aldi/ema.py:43-46``), plain copy at or before
START_ITER (``aldi/ema.py:52-57``), and copy-through for excluded keys
(DETR ``query_embed``, ``aldi/ema.py:17``). The teacher is state, not a
module: no deepcopy, no DDP unwrapping, identical across data-parallel
replicas by construction (same program, same inputs).
"""

from typing import Sequence

import jax.numpy as jnp
from flax.traverse_util import flatten_dict, unflatten_dict


def ema_update(
    ema_params,
    student_params,
    alpha: float,
    step,
    start_iter: int = 0,
    exclude_keys: Sequence[str] = ("query_embed",),
):
    """Blend student into EMA. ``step`` is the current iteration (traced);
    at step <= start_iter the EMA is (re)initialized to a copy."""
    copy_through = step <= start_iter

    flat_e = flatten_dict(ema_params)
    flat_s = flatten_dict(student_params)
    out = {}
    for k, e in flat_e.items():
        s = flat_s[k]
        if any(x in "/".join(map(str, k)) for x in exclude_keys):
            out[k] = s
        else:
            blended = s * (1.0 - alpha) + e * alpha
            out[k] = jnp.where(copy_through, s, blended)
    return unflatten_dict(out)
