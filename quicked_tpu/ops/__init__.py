"""Compute ops: exact semantic model (myers_np) and TPU Pallas kernels."""
