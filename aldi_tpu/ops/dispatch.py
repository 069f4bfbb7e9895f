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

import jax

_OVERRIDE = None


def target_backend() -> str:
    """The platform trace-time kernel dispatch should target: the
    ``force_backend`` override when active, else the live backend."""
    return _OVERRIDE or jax.default_backend()


@contextmanager
def force_backend(platform: str):
    """Pin ``target_backend()`` to ``platform`` (e.g. while exporting a
    serving module for a platform other than the host's)."""
    global _OVERRIDE
    prev = _OVERRIDE
    _OVERRIDE = platform
    try:
        yield
    finally:
        _OVERRIDE = prev
