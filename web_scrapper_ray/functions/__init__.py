"""Scalar/vectorized function library (text, validators, URL canonicalization)."""
