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


class TestShearwarpSharded:
    def test_matches_unsharded(self, small_grid):
        """Row-band-sharded shear-warp equals a full-frame band render
        (interiors; band fans change the intermediate discretization)."""
        import dataclasses

        import numpy as np

        from ovr_tpu import api
        from ovr_tpu.core.scene import Camera, simple_scene
        from ovr_tpu.parallel import mesh as pmesh
        from ovr_tpu.parallel import tiles

        scene = dataclasses.replace(
            simple_scene(small_grid),
            camera=Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5),
                                 fovy=45.0))
        cfg = api.RenderConfig(width=48, height=32, sampling_rate=24.0,
                               shading="diffuse",
                               method="shearwarp").resolved(scene)
        m = pmesh.make_mesh(n_tiles=4, n_bricks=1)
        out = np.asarray(
            jax.jit(lambda s, c: tiles.render_sharded(s, cfg, m, c))(
                scene, scene.camera))
        ref = np.asarray(api.render(scene, cfg).rgba)
        assert out.shape == ref.shape
        # compare premultiplied interiors (band-local ray fans re-discretize
        # the intermediate, so silhouettes may shift sub-pixel)
        pm_o = out[..., :3] * out[..., 3:4]
        pm_r = ref[..., :3] * ref[..., 3:4]
        a = ref[..., 3]
        ys, xs = np.nonzero(a > 0.01)
        inner = np.zeros_like(a, bool)
        inner[ys.min() + 2:ys.max() - 1, xs.min() + 2:xs.max() - 1] = True
        err = np.abs(pm_o - pm_r).max(-1)[inner]
        assert np.quantile(err, 0.95) < 0.06, err.max()

    @pytest.mark.slow
    def test_shadow_sharded(self, small_grid):
        import dataclasses

        import numpy as np

        from ovr_tpu import api
        from ovr_tpu.core.scene import Camera, simple_scene
        from ovr_tpu.parallel import mesh as pmesh
        from ovr_tpu.parallel import tiles

        scene = dataclasses.replace(
            simple_scene(small_grid),
            camera=Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5)))
        cfg = api.RenderConfig(width=32, height=32, sampling_rate=16.0,
                               shading="shadow",
                               method="shearwarp").resolved(scene)
        lg = api.build_light_grid(scene, cfg)
        m = pmesh.make_mesh(n_tiles=4, n_bricks=1)
        out = np.asarray(tiles.render_sharded(scene, cfg, m,
                                              light_grid=lg))
        assert np.isfinite(out).all()
        assert out[..., 3].max() > 0.3


def test_train_step_shearwarp_fast_path(small_grid):
    """make_train_step routes banded shear-warp when cfg carries a plan:
    the distributed differentiable fast path (psum'd grads through the
    bounded-memory adjoint) optimizes toward a target."""
    import dataclasses

    import jax.numpy as jnp

    from ovr_tpu import api
    from ovr_tpu.core.scene import Camera, simple_scene
    from ovr_tpu.parallel import mesh as pmesh, tiles

    scene = dataclasses.replace(
        simple_scene(small_grid),
        camera=Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5)))
    cfg = api.RenderConfig(width=16, height=16, sampling_rate=16.0,
                           shading="none",
                           method="shearwarp").resolved(scene)
    assert cfg.sw is not None
    m = pmesh.make_mesh(n_tiles=4, n_bricks=2)
    target = jnp.zeros((16, 16, 4), jnp.float32)
    state = tiles.init_train_state(scene)
    step = tiles.make_train_step(cfg, m, lr=0.5)
    losses = []
    for _ in range(3):
        state, loss = step(state, scene, scene.camera, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.98, losses
