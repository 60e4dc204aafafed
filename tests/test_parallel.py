"""Multi-device tests on the 8-way virtual CPU mesh: sharded rendering equals
unsharded, distributed gradients equal single-device gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.parallel import mesh as pmesh
from ovr_tpu.parallel import tiles

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _scene(small_grid):
    s = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=45.0)
    return dataclasses.replace(s, camera=cam)


def test_sharded_render_matches_single(small_grid):
    scene = _scene(small_grid)
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=16.0,
                           shading="diffuse").resolved(scene)
    single = np.asarray(api.render(scene, cfg).rgba)
    m = pmesh.make_mesh(n_tiles=8)
    sharded = np.asarray(tiles.render_sharded(scene, cfg, m))
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_render_with_bricks_axis(small_grid):
    scene = _scene(small_grid)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=16.0,
                           shading="none").resolved(scene)
    m = pmesh.make_mesh(n_tiles=4, n_bricks=2)
    sharded = np.asarray(tiles.render_sharded(scene, cfg, m))
    single = np.asarray(api.render(scene, cfg).rgba)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_distributed_train_step_matches_local_grads(small_grid):
    scene = _scene(small_grid)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=12.0,
                           shading="none").resolved(scene)
    m = pmesh.make_mesh(n_tiles=8)
    target = jnp.zeros((8, 8, 4), jnp.float32)

    state = tiles.init_train_state(scene)
    step = tiles.make_train_step(cfg, m, lr=0.0)  # lr 0: inspect loss only
    _, loss = step(state, scene, scene.camera, target)

    # local oracle
    def local_loss(grid):
        s = dataclasses.replace(
            scene, volume=dataclasses.replace(scene.volume, grid=grid))
        rgba = api.render(s, cfg).rgba
        return jnp.sum((rgba - target) ** 2) / (8 * 8 * 4)

    want = float(local_loss(scene.volume.grid))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_distributed_training_reduces_loss(small_grid):
    scene = _scene(small_grid)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=12.0,
                           shading="none").resolved(scene)
    m = pmesh.make_mesh(n_tiles=8)
    # target: the scene rendered with a brighter TF -> optimize tables toward it
    bright = dataclasses.replace(
        scene, tfn=dataclasses.replace(
            scene.tfn, alpha=jnp.clip(scene.tfn.alpha * 1.5, 0, 1)))
    target = api.render(bright, cfg).rgba

    state = tiles.init_train_state(scene)
    step = tiles.make_train_step(cfg, m, lr=2.0, momentum=0.5)
    losses = []
    for _ in range(12):
        state, loss = step(state, scene, scene.camera, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
