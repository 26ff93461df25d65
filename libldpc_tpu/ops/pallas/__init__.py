"""Fused Pallas TPU kernels for the decoder hot path."""
