"""Test configuration.

Tests run on a virtual 8-device CPU platform so that multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware, per the
framework's test strategy (SURVEY.md §4).
"""

import os

# NOTE: in this environment jax is pre-imported at interpreter start with
# JAX_PLATFORMS=axon (the TPU tunnel), so plain env-var exports are too late;
# override through jax.config before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)
