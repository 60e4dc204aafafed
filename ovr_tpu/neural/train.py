"""Training loops for neural-field volumes.

Two regimes, both end-to-end differentiable through this framework:

1. `fit_to_grid` — compress a dense grid into the field by sampling random
   points (the instant-vnr training objective the reference planned:
   evaluation_kernel.h losses over volume samples).
2. `make_image_train_step` — inverse rendering: optimize the field so its
   *rendered images* match targets, gradients flowing through the full
   ray-march (the capability extension in BASELINE.md config #4).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ovr_tpu.neural.field import NeuralFieldVolume, field_sample
from ovr_tpu.neural.losses import LOSSES


def _params(field: NeuralFieldVolume):
    return (field.tables, field.weights)


def _with_params(field: NeuralFieldVolume, params) -> NeuralFieldVolume:
    tables, weights = params
    return dataclasses.replace(field, tables=tables, weights=weights)


def fit_to_grid(field: NeuralFieldVolume, grid: jnp.ndarray, *,
                steps: int = 500, batch: int = 1 << 14, lr: float = 1e-2,
                loss: str = "l2", key=None):
    """Fit the field to a dense (Z, Y, X) grid by random point sampling.

    Returns (field, losses (steps,)).
    """
    from ovr_tpu.core.sampling import sample_volume

    if key is None:
        key = jax.random.PRNGKey(0)
    loss_fn = LOSSES[loss]
    opt = optax.adam(lr)
    params = _params(field)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        p = jax.random.uniform(k, (batch, 3))
        target = sample_volume(grid, p)

        def objective(params):
            pred = field_sample(_with_params(field, params), p)
            return loss_fn(pred, target)

        value, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    def body(carry, k):
        params, opt_state = carry
        params, opt_state, value = step(params, opt_state, k)
        return (params, opt_state), value

    keys = jax.random.split(key, steps)
    losses = []
    carry = (params, opt_state)
    for k in keys:  # host loop keeps step() jitted once; cheap per-step
        carry, v = body(carry, k)
        losses.append(v)
    params, _ = carry
    return _with_params(field, params), jnp.stack(losses)


def make_image_train_step(scene, cfg, *, lr: float = 1e-2,
                          loss: str = "l2"):
    """Inverse rendering step: optimize the neural field so the rendered
    frame matches a target image. scene.volume must be a NeuralFieldVolume.

    Returns (step(params_state, camera, target) -> (params_state, loss),
    init_state).
    """
    from ovr_tpu import api

    field: NeuralFieldVolume = scene.volume
    loss_fn = LOSSES[loss]
    opt = optax.adam(lr)
    params0 = _params(field)
    state0 = (params0, opt.init(params0))

    @partial(jax.jit, static_argnames=())
    def step(state, camera, target):
        params, opt_state = state

        def objective(params):
            s = dataclasses.replace(scene, volume=_with_params(field, params))
            frame = api.render(s, cfg, camera=camera)
            return loss_fn(frame.rgba, target)

        value, grads = jax.value_and_grad(objective)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    return step, state0


def bake_grid(field: NeuralFieldVolume, dims: tuple[int, int, int],
              chunk: int = 1 << 16) -> jnp.ndarray:
    """Evaluate the field on a (Z, Y, X) voxel-center lattice — used to build
    macrocell majorants for neural volumes (the vnr macrocell bake) and for
    export back to a dense grid."""
    X, Y, Z = dims
    xs = (jnp.arange(X) + 0.5) / X
    ys = (jnp.arange(Y) + 0.5) / Y
    zs = (jnp.arange(Z) + 0.5) / Z
    px, py, pz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    p = jnp.stack([px, py, pz], -1).reshape(-1, 3)  # x fastest after reshape?
    # build (Z, Y, X): iterate z-major ordering explicitly
    p = jnp.stack(jnp.meshgrid(zs, ys, xs, indexing="ij")[::-1], -1)
    p = p.reshape(-1, 3)

    def eval_chunk(q):
        return field_sample(field, q)

    n = p.shape[0]
    pad = (-n) % chunk
    p_pad = jnp.pad(p, ((0, pad), (0, 0)))
    out = jax.lax.map(eval_chunk, p_pad.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n].reshape(Z, Y, X)


def bake_grid_host(field: NeuralFieldVolume, dims: tuple[int, int, int],
                   max_slab_points: int = 1 << 24) -> jnp.ndarray:
    """`bake_grid` as a host-side loop of per-Z-slab device dispatches.

    A 512^3 bake is ~134M hash-grid lookups; as one device program it can
    trip runtime execution limits, so the host driver (Renderer.commit,
    bench) bakes slab by slab (~16M points each) and concatenates on
    device. Not traceable — use `bake_grid` inside jit (the
    differentiable path)."""
    X, Y, Z = dims
    per_plane = X * Y
    zs_per = max(1, max_slab_points // per_plane)

    @jax.jit
    def one_slab(f, z0):
        xs = (jnp.arange(X) + 0.5) / X
        ys = (jnp.arange(Y) + 0.5) / Y
        zs = jnp.clip((z0 + jnp.arange(zs_per) + 0.5) / Z, 0.0, 1.0)
        p = jnp.stack(jnp.meshgrid(zs, ys, xs, indexing="ij")[::-1], -1)
        return field_sample(f, p.reshape(-1, 3)).reshape(zs_per, Y, X)

    slabs = [one_slab(field, jnp.int32(z0)) for z0 in range(0, Z, zs_per)]
    return jnp.concatenate(slabs, axis=0)[:Z]
