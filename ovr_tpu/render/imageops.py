"""Framebuffer post-processing chain.

Functional re-expression of the reference's `ImageOp` interface
(`ovr/imageops/imageop.h:10-16` — initialize/process/resize/map, the hook
point for denoisers/upscalers fed by the mini_pytorch experiment): an image
op here is a pure ``Frame -> Frame`` function, and a chain is their
composition, jittable end to end so XLA fuses the whole post stack into the
render when applied inside `jit`.

Built-in ops cover the common post stack: tonemap (Reinhard / ACES-approx),
gamma, exposure, background composite (the straight-alpha over-blend the
apps do before display), and a denoise hook that dispatches to any callable
(e.g. a flax model apply) with the same Frame contract.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax.numpy as jnp


def _with_rgb(frame, rgb):
    rgba = jnp.concatenate([rgb, frame.rgba[..., 3:]], axis=-1)
    return dataclasses.replace(frame, rgba=rgba)


def exposure(stops: float) -> Callable:
    """Scale radiance by 2**stops."""
    k = 2.0 ** stops

    def op(frame):
        return _with_rgb(frame, frame.rgba[..., :3] * k)
    return op


def reinhard_tonemap() -> Callable:
    """x / (1 + x) per channel."""
    def op(frame):
        rgb = frame.rgba[..., :3]
        return _with_rgb(frame, rgb / (1.0 + rgb))
    return op


def aces_tonemap() -> Callable:
    """Narkowicz ACES filmic approximation."""
    def op(frame):
        x = frame.rgba[..., :3]
        out = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
        return _with_rgb(frame, jnp.clip(out, 0.0, 1.0))
    return op


def gamma(g: float = 2.2) -> Callable:
    def op(frame):
        rgb = jnp.maximum(frame.rgba[..., :3], 0.0)
        return _with_rgb(frame, rgb ** (1.0 / g))
    return op


def composite_background(bg_color=(0.0, 0.0, 0.0)) -> Callable:
    """Straight-alpha over a constant background; output alpha = 1."""
    bg = jnp.asarray(bg_color, jnp.float32)

    def op(frame):
        a = frame.rgba[..., 3:4]
        rgb = frame.rgba[..., :3] * a + bg * (1.0 - a)
        rgba = jnp.concatenate([rgb, jnp.ones_like(a)], axis=-1)
        return dataclasses.replace(frame, rgba=rgba)
    return op


def denoise(model_fn: Callable) -> Callable:
    """Hook an arbitrary Frame -> Frame model (denoiser/upscaler) into the
    chain — the role of the libtorch path in the reference
    (`projects/experiment/mini_pytorch/example.cpp:1-65`)."""
    return model_fn


def chain(*ops: Sequence[Callable]) -> Callable:
    """Compose image ops left to right into one Frame -> Frame function."""
    def run(frame):
        for op in ops:
            frame = op(frame)
        return frame
    return run
