"""Streaming subsystem: sources, windows, stateful ops, anomaly scoring."""
