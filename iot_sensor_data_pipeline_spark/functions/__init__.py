"""Scalar/derivation function libraries: the rule engine, text
analysis, and vector math helpers."""
