"""Structured Streaming registry entries (task 5)."""
