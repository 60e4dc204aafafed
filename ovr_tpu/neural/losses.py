"""Training losses (reference: `ovr/common/evaluation_kernel.h:14-36` — the
tiny-cuda-nn L1 / L2 / relative-L2 device kernels)."""

from __future__ import annotations

import jax.numpy as jnp


def l1(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(prediction - target))


def l2(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((prediction - target) ** 2)


def relative_l2(prediction: jnp.ndarray, target: jnp.ndarray,
                eps: float = 0.01) -> jnp.ndarray:
    """(pred-ref)^2 / (pred^2 + eps), the tiny-cuda-nn RelativeL2
    (evaluation_kernel.h:30-36)."""
    d = prediction - target
    return jnp.mean(d * d / (prediction * prediction + eps))


LOSSES = {"l1": l1, "l2": l2, "relative_l2": relative_l2}
