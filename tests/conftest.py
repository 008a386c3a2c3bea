"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's virtual
host devices (SURVEY.md §7 / environment notes).  Env vars must be set before
jax imports anywhere, so this lives at the very top of conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU via config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def tiny_classifier_factory():
    """Factory for small, fast classifiers (bert-tiny dims, small buckets)."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    def make(**config):
        cfg = {
            "train_size_buckets": [64, 256],
            "class_capacity_buckets": [8, 16, 32, 64],
            "example_capacity_buckets": [32, 128],
            **config,
        }
        return AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)

    return make


@pytest.fixture
def rng():
    return np.random.default_rng(0)
