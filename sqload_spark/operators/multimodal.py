"""Multimodal column operators (binary payloads + typed metadata)."""
