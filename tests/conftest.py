"""Test configuration: force JAX onto a virtual 8-device CPU backend.

This is the TPU-native "fake backend" strategy from SURVEY.md §4: all
multi-chip sharding tests run against 8 virtual CPU devices so the mesh /
collective code paths are exercised without TPU hardware. Must run before
the first ``import jax`` anywhere in the test session.
"""

import os

# Override unconditionally: the driver environment pins JAX_PLATFORMS=axon
# (the real TPU tunnel); tests must run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site hook pre-imports jax/axon at interpreter startup, latching
# JAX_PLATFORMS=axon before this file runs — override via the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
