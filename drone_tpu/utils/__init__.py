"""Utilities: config, metrics, checkpointing, profiling."""
