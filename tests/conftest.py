import os

# Must run before jax is imported anywhere: tests run on CPU with 8 virtual
# devices so multi-chip sharding logic is exercised without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache makes repeated test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "all"
)
