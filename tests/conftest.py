import os

# Must run before jax is imported anywhere: tests run on CPU with 8 virtual
# devices so multi-chip sharding logic is exercised without TPU hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
