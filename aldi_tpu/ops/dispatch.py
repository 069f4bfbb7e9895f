"""Backend-dispatch helper for Pallas-vs-XLA op selection.

Several ops pick a Pallas kernel on TPU and an XLA formulation elsewhere
(ROIAlign pool modes, the streaming IoU matcher, the ViT rel-pos flash
attention). The choice is a *trace-time* Python decision, which is normally
right — but ``jax.export`` can lower one traced module for a platform other
than the host's backend (tools/export_model.py lowers cpu AND tpu serving
artifacts from either host). ``force_backend`` pins the decision to the
lowering target for the duration of a trace; everything else keeps
consulting the live backend.
"""

from contextlib import contextmanager
from contextvars import ContextVar

import jax

# ContextVar (not a module global): the override scopes to the forcing
# thread/context, so a concurrent trace elsewhere can't pick it up
_OVERRIDE = ContextVar("aldi_tpu_backend_override", default=None)


def target_backend() -> str:
    """The platform trace-time kernel dispatch should target: the
    ``force_backend`` override when active, else the live backend."""
    return _OVERRIDE.get() or jax.default_backend()


@contextmanager
def force_backend(platform: str):
    """Pin ``target_backend()`` to ``platform`` (e.g. while exporting a
    serving module for a platform other than the host's)."""
    token = _OVERRIDE.set(platform)
    try:
        yield
    finally:
        _OVERRIDE.reset(token)
