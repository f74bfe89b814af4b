"""Test harness bootstrap.

The image wires JAX to a tunneled TPU via a sitecustomize hook that also
routes XLA compilation through a remote relay (5-10s per compile, even for
CPU programs).  Tests need the plain local CPU backend: 8 virtual devices
(for mesh/sharding tests, SURVEY.md §4) and x64 (float64 parity with the
reference's gpflow numerics).  Scrubbing the relay env vars before the first
compile and forcing jax_platforms=cpu keeps everything local and fast.
"""
import os

# Must happen before any JAX compile/backend init.
for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
           "AXON_LOOPBACK_RELAY"):
    os.environ.pop(_v, None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
