"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

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
