"""Scalar function kernels (URL, text, hash, timestamp)."""
