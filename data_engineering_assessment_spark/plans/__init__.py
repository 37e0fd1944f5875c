"""Query plan registry — import side-effect registers all query keys."""

from . import parity, pipeline, relational  # noqa: F401
from .registry import oracles, queries  # noqa: F401
