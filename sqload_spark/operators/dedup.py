"""Deduplication operators (exact / MinHash / SimHash / Jaccard / embedding)."""
