"""Bounded-memory analytic adjoint of front-to-back over-compositing.

The march integrates, per ray,

    V = sum_k  T_k * a_k * v_k,        T_k = prod_{j<k} (1 - a_j)

(`_march_step`, ovr_tpu.render.integrator; reference semantics
`shaders_raymarching.cu:160-166`). Differentiating through the `lax.scan`
stores O(max_steps) residuals per ray. This module provides `over_scan`, a
`jax.custom_vjp` combinator whose backward pass runs the *analytic adjoint*
with reverse-order recomputation instead (SURVEY.md §7 "hard parts"):

  - transmittance is reconstructed backwards by inverting its own
    recurrence, T_k = T_{k+1} / (1 - a_k)  (a_k clamped below 1);
  - with R_k = sum_{j>k} T_j a_j (V̄·v_j) maintained as a reverse running
    sum, the per-step cotangents are closed-form:

        v̄_k = T_k a_k V̄
        ā_k = T_k (V̄·v_k) - (R_k + T̄ T_N) / (1 - a_k)

  - (v_k, a_k) and their parameter cotangents are recomputed per step with
    `jax.vjp` of the user's step function.

Residual memory is O(1) in the step count: the saved state is the inputs
plus the final transmittance. Cost: one extra forward + one backward
evaluation of `f` per step (the classic recompute trade, same as the
reference-free adjoint used by differentiable-rendering literature).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

A_MAX = 1.0 - 1e-6  # keep 1 - a invertible in fp32


def over_scan(f: Callable, n_steps: int, params):
    """Composite `n_steps` of `f` front-to-back with a bounded-memory VJP.

    `f(params, k)` -> (v, a): per-step premultiplied-channel values
    v (..., M) and opacity a (...). `a` is clamped to [0, A_MAX] (forward
    and backward identically). Returns (V (..., M), T (...)): composited
    channels and final transmittance (alpha = 1 - T).

    Differentiable w.r.t. `params` (any pytree) with O(1)-in-steps residual
    memory; `n_steps` and `f` are static.
    """
    return _over_scan(f, n_steps, params)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _over_scan(f, n_steps, params):
    def body(carry, k):
        big_v, trans = carry
        v, a = f(params, k)
        a = jnp.clip(a, 0.0, A_MAX)
        big_v = big_v + (trans * a)[..., None] * v
        trans = trans * (1.0 - a)
        return (big_v, trans), None

    v0, a0 = jax.eval_shape(lambda p: f(p, 0), params)
    big_v = jnp.zeros(v0.shape, v0.dtype)
    trans = jnp.ones(a0.shape, a0.dtype)
    (big_v, trans), _ = jax.lax.scan(body, (big_v, trans),
                                     jnp.arange(n_steps))
    return big_v, trans


def _fwd(f, n_steps, params):
    out = _over_scan(f, n_steps, params)
    return out, (params, out[1])


def adjoint_sweep(f, n_steps, params, t_final, v_bar, t_bar):
    """The analytic reverse sweep: given the forward's final transmittance
    `t_final` and output cotangents (v_bar for V, t_bar for T), recompute
    each step of `f` in reverse order and return the params cotangent —
    O(1)-in-steps residual memory.

    Usable standalone as the backward of ANY forward that computes the same
    over-compositing recurrence (e.g. the fused Pallas slice kernel): only
    (params, t_final) must be saved.
    """

    def step_val(p, k):
        v, a = f(p, k)
        return v, jnp.clip(a, 0.0, A_MAX)

    # integer leaves (native-dtype u8/u16 volume storage) have no tangent
    # space: carry cotangents only for the inexact leaves and reassemble
    # with float0 zeros at the end (what jax.vjp itself produces for them)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    is_float = [jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)
                for x in leaves]
    zero_f = [jnp.zeros_like(x) for x, ok in zip(leaves, is_float) if ok]

    def body(carry, k):
        trans_next, run, pb_f = carry  # T_{k+1}, R_k, float cotangents
        (v, a), vjp_f = jax.vjp(lambda p: step_val(p, k), params)
        one_m = jnp.maximum(1.0 - a, 1e-12)
        trans = trans_next / one_m  # T_k reconstructed in reverse
        w = jnp.sum(v_bar * v, axis=-1)  # V̄·v_k
        a_bar = trans * w - (run + t_bar * t_final) / one_m
        v_bar_k = (trans * a)[..., None] * v_bar
        (p_contrib,) = vjp_f((v_bar_k, a_bar))
        c_leaves = jax.tree_util.tree_leaves(p_contrib)
        c_f = [c for c, ok in zip(c_leaves, is_float) if ok]
        pb_f = [b + c for b, c in zip(pb_f, c_f)]
        run = run + trans * a * w
        return (trans, run, pb_f), None

    run0 = jnp.zeros(t_final.shape, t_final.dtype)
    (_, _, pb_f), _ = jax.lax.scan(
        body, (t_final, run0, zero_f),
        jnp.arange(n_steps - 1, -1, -1))
    import numpy as np
    it = iter(pb_f)
    out_leaves = [
        next(it) if ok else np.zeros(np.shape(x), jax.dtypes.float0)
        for x, ok in zip(leaves, is_float)]
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def _bwd(f, n_steps, res, cots):
    params, t_final = res
    v_bar, t_bar = cots  # cotangents of (V, T)
    return (adjoint_sweep(f, n_steps, params, t_final, v_bar, t_bar),)


_over_scan.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# the march expressed through over_scan
# ---------------------------------------------------------------------------

def march_adjoint(org, direction, scene_leaves, ctx, cfg, step):
    """Fixed-lattice emission-absorption march (shading='none') with the
    bounded-memory adjoint. Same outputs as `integrator.march` with
    shading='none' and no occupancy/jitter/t_cap: premultiplied
    (color (N,3), grad zeros, depth (N,), alpha (N,)).

    Gradients flow to the volume grid, TF tables, value range, rays and the
    box bounds through `over_scan`'s analytic backward with O(1)-in-steps
    residual memory.
    """
    from ovr_tpu.core.sampling import intersect_box
    from ovr_tpu.core.sampling import classify, opacity_correction
    from ovr_tpu.neural.field import sample_any_volume

    n = org.shape[0]
    dt = org.dtype

    params = (org, direction, scene_leaves, ctx.world_lo, ctx.world_hi, step)

    def f(p, k):
        org_, dir_, leaves, wlo, whi, stp = p
        (grid, color_table, alpha_table, value_range, base) = leaves
        t0 = jnp.zeros((n,), dt)
        t1 = jnp.full((n,), 3.4e38, dt)
        t0, t1 = intersect_box(org_, dir_, wlo, whi, t0, t1)
        t0 = jnp.maximum(t0, 0.0)
        t1 = jnp.maximum(t1, t0)
        tx = jnp.minimum(t0 + k * stp, t1)
        ty = jnp.minimum(tx + stp, t1)
        mid = 0.5 * (tx + ty)
        pos = org_ + mid[..., None] * dir_
        p_obj = (pos - wlo) / (whi - wlo)
        s = sample_any_volume(grid, p_obj)
        rgb, a = classify(color_table, alpha_table, value_range, s)
        a = opacity_correction(a, base, ty - tx)
        a = jnp.where(ty > tx, a, 0.0)
        v = jnp.concatenate(
            [jnp.clip(rgb, 0.0, 1.0), mid[..., None]], axis=-1)  # rgb + depth
        return v, a

    big_v, trans = over_scan(f, cfg.max_steps, params)
    color = big_v[..., :3]
    depth = big_v[..., 3]
    alpha = 1.0 - trans
    return color, jnp.zeros_like(color), depth, alpha
