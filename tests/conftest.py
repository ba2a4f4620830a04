"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the env-var route (``JAX_PLATFORMS=cpu``) is overridden by the axon TPU
plugin in this image, so the platform is forced via ``jax.config`` before any
backend initialization.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_crossmodal(rng, n_base=2000, n_query=500, dim=16, shift=0.6):
    """Synthetic cross-modal data: queries drawn from a shifted distribution
    relative to the base (the regime RoarGraph targets)."""
    base = rng.standard_normal((n_base, dim)).astype(np.float32)
    direction = rng.standard_normal((dim,)).astype(np.float32)
    direction /= np.linalg.norm(direction)
    queries = (rng.standard_normal((n_query, dim)) * 0.7 +
               shift * direction).astype(np.float32)
    return base, queries
