"""Operator tools: wideband power scanning, SDR benchmarking."""
