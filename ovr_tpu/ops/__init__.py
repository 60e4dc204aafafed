"""Fused TPU kernels (Pallas) and their bounded-memory adjoints."""

from ovr_tpu.ops.adjoint import over_scan

__all__ = ["over_scan"]
