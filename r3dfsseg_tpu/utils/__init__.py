"""Utilities: logging, metrics, checkpointing, torch interop."""
