"""Fused compositing kernel (ovr_tpu.ops.composite) vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu.ops.composite import (
    composite_over,
    tf_composite_pallas,
    tf_composite_reference,
)


def _random_problem(rng, r, s, n_nodes, vr=(0.1, 0.9)):
    sigma = rng.uniform(-0.2, 1.2, size=(r, s)).astype(np.float32)
    dt = rng.uniform(0.005, 0.02, size=(r, s)).astype(np.float32)
    # sprinkle inactive steps (dt == 0) like post-exit padding
    dt[rng.uniform(size=(r, s)) < 0.15] = 0.0
    color = rng.uniform(size=(n_nodes, 3)).astype(np.float32)
    alpha = rng.uniform(0.0, 0.8, size=(n_nodes,)).astype(np.float32)
    value_range = np.asarray(vr, np.float32)
    return (jnp.asarray(sigma), jnp.asarray(dt), jnp.asarray(color),
            jnp.asarray(alpha), jnp.asarray(value_range))


def test_composite_over_matches_sequential(rng):
    r, s = 5, 13
    rgb = jnp.asarray(rng.uniform(size=(r, s, 3)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0, 0.9, size=(r, s)).astype(np.float32))
    color, alpha = composite_over(rgb, a)
    # sequential front-to-back oracle
    c_seq = np.zeros((r, 3), np.float32)
    t_seq = np.ones((r,), np.float32)
    for i in range(s):
        c_seq += t_seq[:, None] * np.asarray(rgb[:, i]) * np.asarray(
            a[:, i])[:, None]
        t_seq *= 1.0 - np.asarray(a[:, i])
    np.testing.assert_allclose(np.asarray(color), c_seq, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), 1.0 - t_seq, atol=1e-5)


@pytest.mark.parametrize("r,s,n_nodes", [
    (128, 32, 64),     # aligned everything, single chunk
    (128, 32, 256),    # two table chunks
    (37, 11, 7),       # unaligned rays, steps, tiny table
    (256, 40, 130),    # unaligned table (pads to 256 -> 2 chunks)
])
def test_pallas_matches_reference(rng, r, s, n_nodes):
    sigma, dt, color, alpha, vr = _random_problem(rng, r, s, n_nodes)
    base = jnp.float32(100.0)
    c_ref, a_ref = tf_composite_reference(sigma, dt, color, alpha, vr, base)
    c_ker, a_ker = tf_composite_pallas(sigma, dt, color, alpha, vr, base)
    np.testing.assert_allclose(np.asarray(c_ker), np.asarray(c_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_ker), np.asarray(a_ref),
                               atol=2e-5)


def test_pallas_base_dt_one_special_case(rng):
    """base*dt == 1 must skip opacity correction (nearly_equal path)."""
    sigma, dt, color, alpha, vr = _random_problem(rng, 16, 8, 32)
    dt = jnp.full_like(dt, 0.01)
    base = jnp.float32(100.0)  # base*dt == 1 exactly
    c_ref, a_ref = tf_composite_reference(sigma, dt, color, alpha, vr, base)
    c_ker, a_ker = tf_composite_pallas(sigma, dt, color, alpha, vr, base)
    np.testing.assert_allclose(np.asarray(c_ker), np.asarray(c_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(a_ker), np.asarray(a_ref),
                               atol=2e-5)


def test_pallas_custom_vjp_matches_reference_grads(rng):
    sigma, dt, color, alpha, vr = _random_problem(rng, 16, 12, 24)
    base = jnp.float32(64.0)

    def loss_k(sigma, color, alpha):
        c, a = tf_composite_pallas(sigma, dt, color, alpha, vr, base)
        return jnp.sum(c) + 0.5 * jnp.sum(a)

    def loss_r(sigma, color, alpha):
        c, a = tf_composite_reference(sigma, dt, color, alpha, vr, base)
        return jnp.sum(c) + 0.5 * jnp.sum(a)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(sigma, color, alpha)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(sigma, color, alpha)
    for a_, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=1e-5)


def test_pallas_jits(rng):
    sigma, dt, color, alpha, vr = _random_problem(rng, 128, 16, 64)
    f = jax.jit(tf_composite_pallas)
    c, a = f(sigma, dt, color, alpha, vr, jnp.float32(50.0))
    assert c.shape == (128, 3) and a.shape == (128,)
    assert bool(jnp.all(jnp.isfinite(c)))
