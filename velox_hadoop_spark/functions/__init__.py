"""Scalar/utility function helpers shared by operator modules."""
