"""Test harness: force an 8-device virtual CPU platform before JAX loads.

This is the JAX-world fake-backend idiom for testing pjit/mesh code without
real TPU hardware (SURVEY.md §4). It must run before any module imports jax,
which pytest's conftest ordering guarantees.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
