"""Utilities: profiling/step timing, logging."""
