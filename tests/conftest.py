"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The real TPU (one chip via the axon tunnel) is reserved for benchmarks;
tests exercise numerics and the multi-chip sharding paths on host CPU
with 8 virtual devices, per the project's testing strategy (cf.
SURVEY.md §4: the reference's "fakes" are synthetic cal files, not
communication mocks — same here).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize forces JAX_PLATFORMS=axon; the config update
# below wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
