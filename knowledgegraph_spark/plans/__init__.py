"""Logical pipeline plans: end-to-end KG construction job graphs."""
