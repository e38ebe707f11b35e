"""Structured Streaming layer: job wiring (single-read multi-sink,
checkpointed), streaming dedup, and synthetic stream sources.

The DataFrame -> DataFrame transforms live in operators/ and functions/
and are shared verbatim with batch — Spark's unified API means the
streaming layer only adds sources, sinks, watermarks, and lifecycle.
"""
