"""Persisted approximate-nearest-neighbor index artifacts."""

from . import index  # noqa: F401
