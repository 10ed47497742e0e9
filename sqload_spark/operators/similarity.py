"""Similarity search over `embeddings` (brute-force cosine top-k, LSH ANN)."""
