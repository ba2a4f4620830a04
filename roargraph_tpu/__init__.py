"""roargraph-tpu: a TPU-native engine for cross-modal approximate nearest
neighbor search with the capabilities of RoarGraph (VLDB 2024).

See SURVEY.md for the structural analysis of the reference implementation and
DESIGN.md for the TPU-first architecture.
"""
from .config import BuildConfig, Metric, SearchConfig  # noqa: F401
from .graph import PaddedGraph  # noqa: F401
from .index import RoarGraphIndex  # noqa: F401
from .tiles import TileIndex  # noqa: F401

__version__ = "0.1.0"
