"""Utilities: profiling timers, logging helpers."""
