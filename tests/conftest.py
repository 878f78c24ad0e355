"""Test harness: force an 8-device virtual CPU platform before tests run.

This is the JAX-world fake-backend idiom for testing pjit/mesh code without
real TPU hardware (SURVEY.md §4).

Gotcha specific to this environment: the axon sitecustomize calls
`jax.config.update("jax_platforms", "axon,cpu")` at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must update the jax config
directly (before any backend initializes), not just the environment.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
