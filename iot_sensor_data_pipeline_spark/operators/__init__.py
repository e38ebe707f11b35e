"""Relational + pipeline operators, each a pure DataFrame -> DataFrame
function so batch and streaming share the same implementation."""
