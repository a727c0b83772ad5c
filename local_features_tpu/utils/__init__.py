"""Utilities: synthetic scene rendering for tests/benchmarks, image IO."""

from . import synth

__all__ = ["synth"]
