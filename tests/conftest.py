import os

# Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
# exercised without TPU hardware. NOTE: this interpreter PRELOADS jax at
# startup (site hook), so env vars alone are too late — use jax.config,
# which works as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # same portable-ISA pin as __graft_entry__.dryrun_multichip, so the
    # repo-shipped .jax_dryrun_cache entries hit from the test suite too
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

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


# Two-tier suite (README "Running the tests"): these modules compile full
# train steps / backbones / torch-parity oracles and dominate suite wall
# clock; they carry @pytest.mark.slow via the hook below. The quick tier
# (`pytest -m "not slow"`) still covers every subsystem: ops, data
# pipeline, config corpus loading, distill math, COCO eval, checkpointing,
# and one tiny sharded train step per family (test_graft_entry rides the
# repo-shipped .jax_dryrun_cache so its per-family steps stay warm).
_SLOW_MODULES = {
    "test_all_configs.py",
    "test_backbones.py",
    "test_checkpoint_convert_families.py",
    "test_detr.py",
    "test_end_to_end.py",
    "test_export.py",
    "test_learning_signal.py",
    "test_proposals.py",
    "test_rcnn_forward.py",
    "test_tensor_parallel.py",
    "test_torch_parity.py",
    "test_torch_parity_convnext.py",
    "test_torch_parity_detr.py",
    "test_torch_parity_vit.py",
    "test_torch_parity_yolo.py",
    "test_train_step.py",
    "test_trainer_mesh.py",
    "test_yolo.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    slow = pytest.mark.slow
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(slow)


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
