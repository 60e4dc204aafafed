"""Bounded-memory over-compositing adjoint (ops.adjoint) vs scan autodiff."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.ops import adjoint
from ovr_tpu.render import integrator as ig
from ovr_tpu.render.camera import generate_rays, pixel_screen_coords


def _setup(small_grid, n_rays=33, rate=24.0):
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5), fovy=45.0)
    scene = dataclasses.replace(scene, camera=cam)
    cfg = api.RenderConfig(width=16, height=16, sampling_rate=rate,
                           shading="none").resolved(scene)
    screen = pixel_screen_coords(16, 16).reshape(-1, 2)[:n_rays]
    org, direction = generate_rays(cam, screen, 16, 16)
    leaves = (scene.volume.grid, scene.tfn.color, scene.tfn.alpha,
              scene.tfn.value_range, jnp.ones(()))
    ctx = ig.ShadeContext(
        light_dir=jnp.array([0.0, 1.0, 0.0]), wtc=jnp.eye(3),
        world_lo=scene.volume.world_lo, world_hi=scene.volume.world_hi)
    mcfg = ig.MarchConfig(max_steps=cfg.max_steps, shading="none")
    step = jnp.asarray(1.0 / rate)
    return org, direction, leaves, ctx, mcfg, cfg, step


class TestOverScan:
    def test_forward_matches_direct(self, rng):
        n, m = 17, 9
        vs = jnp.asarray(rng.random((m, n, 3)), jnp.float32)
        al = jnp.asarray(0.6 * rng.random((m, n)), jnp.float32)

        def f(params, k):
            v, a = params
            return v[k], a[k]

        big_v, trans = adjoint.over_scan(f, m, (vs, al))
        c = jnp.zeros((n, 3))
        t = jnp.ones((n,))
        for k in range(m):
            c = c + (t * al[k])[..., None] * vs[k]
            t = t * (1 - al[k])
        np.testing.assert_allclose(np.asarray(big_v), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(trans), np.asarray(t),
                                   rtol=1e-5)

    def test_grad_matches_scan_autodiff(self, rng):
        n, m = 11, 7
        vs = jnp.asarray(rng.random((m, n, 2)), jnp.float32)
        al = jnp.asarray(0.7 * rng.random((m, n)), jnp.float32)

        def f(params, k):
            v, a = params
            return v[k] * jnp.tanh(a[k])[..., None], jnp.sin(a[k]) ** 2

        def loss_adj(params):
            big_v, trans = adjoint.over_scan(f, m, params)
            return jnp.sum(big_v ** 2) + jnp.sum((1 - trans) ** 3)

        def loss_ref(params):
            def body(carry, k):
                c, t = carry
                v, a = f(params, k)
                a = jnp.clip(a, 0.0, adjoint.A_MAX)
                return (c + (t * a)[..., None] * v, t * (1 - a)), None
            (c, t), _ = jax.lax.scan(
                body, (jnp.zeros((n, 2)), jnp.ones((n,))), jnp.arange(m))
            return jnp.sum(c ** 2) + jnp.sum((1 - t) ** 3)

        g_adj = jax.grad(loss_adj)((vs, al))
        g_ref = jax.grad(loss_ref)((vs, al))
        for a, b in zip(jax.tree_util.tree_leaves(g_adj),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)

    def test_saturating_alpha(self, rng):
        """alpha -> 1 (early-exit regime) stays finite in the backward."""
        n, m = 5, 6
        vs = jnp.asarray(rng.random((m, n, 1)), jnp.float32)
        al = jnp.ones((m, n), jnp.float32)  # fully opaque every step

        def f(params, k):
            v, a = params
            return v[k], a[k]

        g = jax.grad(lambda p: jnp.sum(adjoint.over_scan(f, m, p)[0]))(
            (vs, al))
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()


class TestMarchAdjoint:
    def test_forward_parity_with_march(self, small_grid):
        org, d, leaves, ctx, mcfg, cfg, step = _setup(small_grid)
        c_ref, _, dep_ref, a_ref = ig.march(org, d, leaves, ctx, mcfg, step)
        c_adj, _, dep_adj, a_adj = adjoint.march_adjoint(
            org, d, leaves, ctx, cfg, step)
        np.testing.assert_allclose(np.asarray(c_adj), np.asarray(c_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a_adj), np.asarray(a_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dep_adj), np.asarray(dep_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_grid_tf_gradients_match_autodiff(self, small_grid):
        org, d, leaves, ctx, mcfg, cfg, step = _setup(small_grid, n_rays=17)

        def loss_adj(grid, alpha_table):
            lv = (grid, leaves[1], alpha_table, leaves[3], leaves[4])
            c, _, _, a = adjoint.march_adjoint(org, d, lv, ctx, cfg, step)
            return jnp.sum(c ** 2) + jnp.sum(a)

        def loss_ref(grid, alpha_table):
            lv = (grid, leaves[1], alpha_table, leaves[3], leaves[4])
            c, _, _, a = ig.march(org, d, lv, ctx, mcfg, step)
            return jnp.sum(c ** 2) + jnp.sum(a)

        ga = jax.grad(loss_adj, argnums=(0, 1))(leaves[0], leaves[2])
        gr = jax.grad(loss_ref, argnums=(0, 1))(leaves[0], leaves[2])
        for a, b in zip(ga, gr):
            aa, bb = np.asarray(a), np.asarray(b)
            scale = np.abs(bb).max() + 1e-8
            np.testing.assert_allclose(aa / scale, bb / scale, atol=2e-3)

    def test_ray_gradients_match_autodiff(self, small_grid):
        org, d, leaves, ctx, mcfg, cfg, step = _setup(small_grid, n_rays=9)

        def loss_adj(org_):
            c, _, _, _ = adjoint.march_adjoint(org_, d, leaves, ctx, cfg,
                                               step)
            return jnp.sum(c ** 2)

        def loss_ref(org_):
            c, _, _, _ = ig.march(org_, d, leaves, ctx, mcfg, step)
            return jnp.sum(c ** 2)

        ga = np.asarray(jax.grad(loss_adj)(org))
        gr = np.asarray(jax.grad(loss_ref)(org))
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(ga / scale, gr / scale, atol=2e-3)

    def test_bounded_residual_memory(self, small_grid):
        """Residual (temp) memory must not scale with max_steps, unlike
        scan autodiff. Asserted via compiled memory analysis when the
        backend provides it."""
        org, d, leaves, ctx, mcfg, cfg, step = _setup(small_grid, n_rays=64)

        def temp_bytes(max_steps):
            c = dataclasses.replace(cfg, max_steps=max_steps)

            def loss(grid):
                lv = (grid,) + leaves[1:]
                col, _, _, _ = adjoint.march_adjoint(org, d, lv, ctx, c,
                                                     step)
                return jnp.sum(col)

            compiled = jax.jit(jax.grad(loss)).lower(leaves[0]).compile()
            ma = compiled.memory_analysis()
            if ma is None:
                pytest.skip("backend lacks memory_analysis")
            return ma.temp_size_in_bytes

        small, large = temp_bytes(32), temp_bytes(512)
        # 16x more steps must not grow residents more than ~2x
        assert large <= 2 * small + (1 << 20), (small, large)
