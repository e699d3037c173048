"""Scalar/vector function library (embedding, hashing, text exprs)."""
