"""Scalar/token kernels and their Spark column wrappers."""
