"""Test configuration: force an 8-device virtual CPU mesh before JAX inits.

Multi-chip sharding is validated on a virtual CPU mesh per SURVEY.md §4(5);
real-TPU benchmarks run separately via bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
