"""Shared utilities: metrics, tracing, persistence."""
