"""Neural-field volume tests: encoding properties, grid fitting, rendering
through the field, and end-to-end inverse-rendering gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene, TransferFunction
from ovr_tpu.neural import (
    HashGridConfig,
    NeuralFieldVolume,
    bake_grid,
    field_sample,
    fit_to_grid,
    init_field,
    make_image_train_step,
)
from ovr_tpu.neural.losses import l1, l2, relative_l2

CFG = HashGridConfig(n_levels=4, log2_table_size=12, base_resolution=4,
                     max_resolution=32)


def test_encoding_shapes_and_continuity():
    field = init_field(jax.random.PRNGKey(0), CFG, hidden=16, n_hidden=1)
    p = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
    v = field_sample(field, p)
    assert v.shape == (100,)
    assert np.all((np.asarray(v) >= 0) & (np.asarray(v) <= 1))
    # continuity: nearby points give nearby values
    eps = 1e-4
    v2 = field_sample(field, p + eps)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=0.02)


def test_losses():
    p = jnp.asarray([1.0, 2.0])
    t = jnp.asarray([0.0, 0.0])
    assert float(l1(p, t)) == 1.5
    assert float(l2(p, t)) == 2.5
    np.testing.assert_allclose(
        float(relative_l2(p, t)),
        0.5 * (1 / 1.01 + 4 / 4.01), rtol=1e-6)


def test_fit_to_grid_reduces_loss(small_grid):
    field = init_field(jax.random.PRNGKey(0), CFG, hidden=32, n_hidden=2)
    grid = jnp.asarray(small_grid)
    field, losses = fit_to_grid(field, grid, steps=60, batch=4096, lr=5e-3)
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # field now approximates the grid
    from ovr_tpu.core.sampling import sample_volume
    p = jax.random.uniform(jax.random.PRNGKey(2), (512, 3))
    err = np.abs(np.asarray(field_sample(field, p))
                 - np.asarray(sample_volume(grid, p)))
    assert err.mean() < 0.15


def _neural_scene(field):
    tfn = TransferFunction.create(
        np.stack([np.linspace(0, 1, 8)] * 3, -1), np.linspace(0, 0.8, 8),
        (0.0, 1.0))
    cam = Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5), fovy=45.0)
    return Scene.create(field, tfn, camera=cam, volume_sampling_rate=12.0)


def test_render_through_neural_field():
    field = init_field(jax.random.PRNGKey(3), CFG, hidden=16, n_hidden=1)
    scene = _neural_scene(field)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=12.0,
                           shading="diffuse").resolved(scene)
    frame = api.render(scene, cfg)
    rgba = np.asarray(frame.rgba)
    assert rgba.shape == (8, 8, 4)
    assert np.all(np.isfinite(rgba))
    assert rgba[..., 3].max() > 0.01  # sigmoid(0-ish) init is semi-opaque


def test_inverse_rendering_step_improves(small_grid):
    # target: a *dense-grid* scene rendered with the same TF/camera; the
    # learner is a fresh neural field (inits render ~constant sigmoid(0))
    from ovr_tpu.core.scene import StructuredVolume
    scene_t = _neural_scene(StructuredVolume.create(small_grid))
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=12.0,
                           shading="none").resolved(scene_t)
    target = api.render(scene_t, cfg).rgba

    learner = init_field(jax.random.PRNGKey(99), CFG, hidden=16, n_hidden=1)
    scene_l = _neural_scene(learner)
    step, state = make_image_train_step(scene_l, cfg, lr=1e-2)
    losses = []
    for _ in range(15):
        state, loss = step(state, scene_l.camera, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses


def test_bake_grid_matches_field():
    field = init_field(jax.random.PRNGKey(5), CFG, hidden=16, n_hidden=1)
    g = bake_grid(field, (8, 8, 8), chunk=64)
    assert g.shape == (8, 8, 8)
    # spot check voxel centers
    p = jnp.asarray([[(3 + 0.5) / 8, (2 + 0.5) / 8, (1 + 0.5) / 8]])
    v = field_sample(field, p)
    np.testing.assert_allclose(float(g[1, 2, 3]), float(v[0]), rtol=1e-5)


def test_proxy_fast_path_matches_march():
    """Neural volumes route through shear-warp over a baked proxy grid
    (BASELINE config #4's fast path); the proxy render approximates the
    exact field march within bake-discretization tolerance."""
    field = init_field(jax.random.PRNGKey(7), CFG, hidden=16, n_hidden=1)
    scene = _neural_scene(field)
    cfg_fast = api.RenderConfig(
        width=32, height=24, spp=1, sampling_rate=24.0, shading="none",
        method="auto", neural_proxy_res=48).resolved(scene)
    assert cfg_fast.sw is not None, "neural proxy plan did not resolve"
    f_fast = api.render(scene, cfg_fast)
    cfg_ref = api.RenderConfig(width=32, height=24, spp=1,
                               sampling_rate=24.0, shading="none",
                               method="march").resolved(scene)
    f_ref = api.render(scene, cfg_ref)
    err = np.abs(np.asarray(f_fast.rgba) - np.asarray(f_ref.rgba))
    assert err.mean() < 0.05, err.mean()


def test_proxy_gradients_reach_weights_fd():
    """Weight gradients flow through render -> baked proxy -> field and
    match finite differences (the differentiable bake)."""
    field = init_field(jax.random.PRNGKey(8), CFG, hidden=8, n_hidden=1)
    scene = _neural_scene(field)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=8.0,
                           shading="none", method="auto",
                           neural_proxy_res=16).resolved(scene)
    assert cfg.sw is not None

    import dataclasses as dc

    def loss(tables):
        f2 = dc.replace(field, tables=tables)
        s2 = dc.replace(scene, volume=f2)
        return jnp.mean(api.render(s2, cfg).rgba ** 2)

    g = jax.grad(loss)(field.tables)
    gn = np.asarray(g)
    assert np.isfinite(gn).all() and np.abs(gn).max() > 0
    # directional secant check (single-entry FD lands on the kinks of the
    # piecewise-linear TF classification; a random direction averages
    # over them)
    thresh = np.quantile(np.abs(gn), 0.999)
    v = np.where(np.abs(gn) >= thresh, np.sign(gn), 0.0).astype(np.float32)
    assert v.any()
    t0 = np.asarray(field.tables)
    # eps small enough that the secant does not straddle the kinks of the
    # piecewise-linear TF classification (FD converges to the autodiff
    # value as eps -> 0; at 1e-3 the kink bias is ~20%)
    eps = 1e-4
    fd = (float(loss(jnp.asarray(t0 + eps * v)))
          - float(loss(jnp.asarray(t0 - eps * v)))) / (2 * eps)
    np.testing.assert_allclose(float((gn * v).sum()), fd, rtol=0.08,
                               atol=1e-7)


def test_bake_grid_host_matches_traced():
    """The slab-wise host bake equals the traceable bake."""
    from ovr_tpu.neural.train import bake_grid_host
    field = init_field(jax.random.PRNGKey(5), CFG, hidden=16, n_hidden=1)
    a = bake_grid(field, (16, 12, 8), chunk=64)
    b = bake_grid_host(field, (16, 12, 8), max_slab_points=8 * 12 * 5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
