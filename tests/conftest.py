import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware. NOTE: this interpreter PRELOADS jax at
# startup (site hook), so env vars alone are too late — use jax.config,
# which works as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_devs = jax.devices()
assert _devs[0].platform == "cpu" and len(_devs) >= 8, (
    f"test env must be 8+ virtual CPU devices, got {_devs}"
)

# Persistent compilation cache makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all"
)


def _ensure_native_extension():
    """Build the C++ data-loader core so its tests run instead of silently
    skipping (it is shipped code, not an optional extra). Falls back to a
    visible warning when the toolchain or libjpeg/libpng are absent."""
    import importlib.util
    import subprocess
    import sys

    if importlib.util.find_spec("aldi_native") is not None:
        return
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        subprocess.run(
            [sys.executable, os.path.join(root, "native", "setup.py")],
            cwd=root, check=True, capture_output=True, timeout=600,
        )
        importlib.invalidate_caches()
        if root not in sys.path:
            sys.path.insert(0, root)
    except Exception as e:
        sys.stderr.write(f"[conftest] aldi_native build failed ({e}); "
                         "native loader tests will skip\n")


_ensure_native_extension()
