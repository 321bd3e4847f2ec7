"""Structured Streaming surfaces (batch/stream-agnostic kernels)."""
