"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh per SURVEY.md §4(5);
real-TPU benchmarks run separately via bench.py.

NOTE: this environment's sitecustomize imports jax at interpreter startup
(axon PJRT registration), so JAX_PLATFORMS is already snapshotted by the
time conftest runs — os.environ alone is too late. We must use
jax.config.update. XLA_FLAGS is still read lazily at CPU-client creation,
so setting it here works as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
