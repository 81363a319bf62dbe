"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (multi-chip is validated on a virtual mesh)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests run on a virtual CPU mesh
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin's sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — override it
# back before any backend initializes so the 8 virtual CPU devices appear.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from vectorsearch_rbac_tpu.rbac.generators import TreeRBACGenerator
from vectorsearch_rbac_tpu.data import synthetic_corpus


@pytest.fixture(scope="session")
def small_world():
    """Deterministic small RBAC world: 24 roles, 200 docs, 120 users."""
    return TreeRBACGenerator(
        num_users=120, num_roles=24, num_docs=200, h=3, b0=2, b1=3, seed=7
    ).generate()


@pytest.fixture(scope="session")
def small_corpus():
    """200 docs x 4 blocks, 32-d."""
    return synthetic_corpus(num_docs=200, blocks_per_doc=4, dim=32, seed=3)
