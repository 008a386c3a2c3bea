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


def synthetic_embed(texts, dim=128, n_clusters=64, noise=0.05):
    """Deterministic, well-separated embeddings keyed on a ``cluster:`` text
    prefix (falls back to hashing the whole text).  Lets behavior tests
    exercise the full pipeline below the encoder with discriminative inputs,
    the way the reference's EWC tests use synthetic data."""
    from adaptive_classifier_tpu.models.encoder import hash_name

    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        key = t.split(":", 1)[0] if ":" in t else t
        center_rng = np.random.default_rng(hash_name(key) % (2**31))
        center = center_rng.standard_normal(dim)
        noise_rng = np.random.default_rng(hash_name(t) % (2**31))
        v = center + noise * noise_rng.standard_normal(dim)
        out[i] = v / np.linalg.norm(v)
    return out


@pytest.fixture(scope="module")
def synth_classifier_factory():
    """Classifier whose embeddings are synthetic/discriminative (encoder
    bypassed) — for behavior tests that need real class separation offline."""
    from adaptive_classifier_tpu import AdaptiveClassifier

    def make(**config):
        cfg = {
            "train_size_buckets": [64, 256, 1024],
            "class_capacity_buckets": [8, 16, 32, 64],
            "example_capacity_buckets": [32, 128],
            **config,
        }
        clf = AdaptiveClassifier("prajjwal1/bert-tiny", config=cfg)
        clf._get_embeddings = lambda texts: synthetic_embed(
            texts, dim=clf.embedding_dim
        )
        return clf

    return make
