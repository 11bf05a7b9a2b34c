"""Utilities: checkpointing, torch checkpoint conversion, profiling, visualization."""
