"""Test harness: force CPU with 8 virtual devices before JAX initializes.

The reference has no tests at all (SURVEY.md §4); this harness upgrades its
self-verifying-run discipline (CPU readback + is-sorted scan,
``ParallelSort.cpp:326-352``) to a real pytest suite.  Multi-chip logic runs
against XLA's virtual-device CPU simulation so the mesh/all_to_all code is
exercised in CI without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize registers the axon TPU backend at interpreter
# startup (before conftest), so flipping JAX_PLATFORMS in the environment is
# not enough — override through jax.config, which wins as long as no backend
# has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20170101)
