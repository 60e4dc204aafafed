"""Fused TPU kernels (Pallas) and their jnp oracles."""

from ovr_tpu.ops.composite import (
    composite_over,
    tf_composite_pallas,
    tf_composite_reference,
)

__all__ = [
    "composite_over",
    "tf_composite_pallas",
    "tf_composite_reference",
]
