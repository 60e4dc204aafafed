"""Bricked-volume ring compositing vs the unbricked renderer.

The bricked path integrates each ray on the same global march lattice as the
single-device renderer, so the composited result must match up to fp ordering
and the (tiny) early-exit transmittance tail.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.parallel import bricks, mesh as pmesh


def _scene(small_grid, cam_from, cam_at=(0.5, 0.5, 0.5)):
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=cam_from, at=cam_at, fovy=60.0)
    return dataclasses.replace(scene, camera=cam)


def _cfg(shading="none", w=16, h=16):
    return api.RenderConfig(width=w, height=h, spp=1, sampling_rate=48.0,
                            shading=shading)


@pytest.mark.parametrize("cam_from", [
    (0.5, 0.5, -1.6),   # rays ascending in z
    pytest.param((0.5, 0.5, 2.6), marks=pytest.mark.slow),   # descending
    pytest.param((-1.6, 0.4, 0.5), marks=pytest.mark.slow),  # along x
])
@pytest.mark.parametrize("shading", ["none", "diffuse"])
def test_bricked_matches_unbricked(small_grid, cam_from, shading):
    scene = _scene(small_grid, cam_from)
    cfg = _cfg(shading).resolved(scene)
    ref = np.asarray(api.render(scene, cfg).rgba)

    m = pmesh.make_mesh(n_tiles=2, n_bricks=4)
    bv = bricks.brick_volume(scene.volume, 4)
    got = np.asarray(bricks.render_bricked(scene, bv, cfg, m))
    np.testing.assert_allclose(got, ref, atol=2e-3)


@pytest.mark.slow
def test_ring_equals_gather(small_grid):
    scene = _scene(small_grid, (-1.2, 0.7, 0.2))
    cfg = _cfg("diffuse").resolved(scene)
    m = pmesh.make_mesh(n_tiles=2, n_bricks=4)
    bv = bricks.brick_volume(scene.volume, 4)
    ring = np.asarray(bricks.render_bricked(scene, bv, cfg, m, use_ring=True))
    gat = np.asarray(bricks.render_bricked(scene, bv, cfg, m, use_ring=False))
    np.testing.assert_allclose(ring, gat, atol=1e-6)


@pytest.mark.slow
def test_bricked_gradients_match(small_grid):
    """TF-alpha gradients through the bricked ring match the unbricked ones."""
    scene = _scene(small_grid, (0.5, 0.5, -1.6))
    cfg = _cfg("none", w=8, h=8).resolved(scene)
    m = pmesh.make_mesh(n_tiles=2, n_bricks=4)
    bv = bricks.brick_volume(scene.volume, 4)

    def loss_unbricked(alpha):
        tfn = dataclasses.replace(scene.tfn, alpha=alpha)
        s = dataclasses.replace(scene, tfn=tfn)
        return jnp.mean(api.render(s, cfg).rgba)

    def loss_bricked(alpha):
        tfn = dataclasses.replace(scene.tfn, alpha=alpha)
        s = dataclasses.replace(scene, tfn=tfn)
        return jnp.mean(bricks.render_bricked(s, bv, cfg, m))

    g_ref = np.asarray(jax.grad(loss_unbricked)(scene.tfn.alpha))
    g_brk = np.asarray(jax.grad(loss_bricked)(scene.tfn.alpha))
    np.testing.assert_allclose(g_brk, g_ref, atol=1e-4)


@pytest.mark.parametrize("cam_from", [
    (0.5, 0.5, -1.6),   # principal axis == brick axis, ascending
    pytest.param((0.5, 0.5, 2.6), marks=pytest.mark.slow),  # descending
    pytest.param((-1.6, 0.4, 0.5), marks=pytest.mark.slow),  # transverse
])
@pytest.mark.parametrize("shading", ["none", "diffuse", "shadow"])
def test_bricked_shearwarp_matches_unbricked(small_grid, cam_from, shading):
    """The bricked shear-warp fast path (per-brick fused slice loops +
    fan-space ring compositing) matches the unbricked shear-warp render.
    Exact modulo fp for 'none'/'shadow' (plane intervals nest in ownership
    ranges; transmittances multiply exactly); 'diffuse' differs at each
    brick's first plane along the axis (the axial FD term restarts)."""
    scene = _scene(small_grid, cam_from)
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=48.0,
                           shading=shading, method="shearwarp",
                           sw_slice_align=4).resolved(scene)
    assert cfg.sw is not None
    lg = (api.build_light_grid(scene, cfg)
          if api._wants_light_grid(cfg) else None)
    ref = np.asarray(api.render(scene, cfg, light_grid=lg).rgba)

    m = pmesh.make_mesh(n_tiles=1, n_bricks=4)
    bv = bricks.brick_volume(scene.volume, 4)
    got = np.asarray(bricks.render_bricked(scene, bv, cfg, m,
                                           light_grid=lg))
    tol = 1e-3 if shading == "none" else 3e-2
    np.testing.assert_allclose(got, ref, atol=tol)


@pytest.mark.slow
def test_bricked_shearwarp_tiles_and_bricks(small_grid):
    """tiles x bricks combined: each band uses its own shrunk ray fan, so
    parity with the unbricked full-frame fan is loose (resampling grids
    differ) but structural."""
    scene = _scene(small_grid, (0.5, 0.5, -1.6))
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=48.0,
                           shading="none", method="shearwarp",
                           sw_slice_align=2).resolved(scene)
    ref = np.asarray(api.render(scene, cfg).rgba)
    m = pmesh.make_mesh(n_tiles=4, n_bricks=2)
    bv = bricks.brick_volume(scene.volume, 2)
    got = np.asarray(bricks.render_bricked(scene, bv, cfg, m))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=6e-2)


def test_brick_volume_geometry(small_grid):
    scene = _scene(small_grid, (0.5, 0.5, -1.6))
    bv = bricks.brick_volume(scene.volume, 4)
    assert bv.bricks.shape == (4, 10, 24, 24)  # 24/4 + 2x2 halo voxels
    # ownership partitions [0,1] in z
    olo = np.asarray(bv.own_lo)[:, 2]
    ohi = np.asarray(bv.own_hi)[:, 2]
    np.testing.assert_allclose(olo, [0.0, 0.25, 0.5, 0.75])
    np.testing.assert_allclose(ohi, [0.25, 0.5, 0.75, 1.0])


def test_bricked_train_step_matches_unbricked(small_grid):
    """The volume-sharded training step (halo-gradient ppermute exchange +
    halo refresh) produces the same updated grid and TF tables as an
    unbricked SGD step — the grid is never replicated."""
    import jax

    scene = _scene(small_grid, (0.5, 0.5, -1.6))
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=48.0,
                           shading="none", method="shearwarp",
                           sw_slice_align=8).resolved(scene)
    m = pmesh.make_mesh(n_tiles=1, n_bricks=8)
    bv = bricks.brick_volume(scene.volume, 8)
    lr = 0.25
    step = bricks.make_train_step_bricked(cfg, m, lr=lr)
    target = jnp.zeros((16, 16, 4), jnp.float32)
    bv2, tfc2, tfa2, loss = step(bv, scene.tfn.color, scene.tfn.alpha,
                                 scene, scene.camera, target)
    nb = np.asarray(bv2.bricks)
    rebuilt = np.concatenate([nb[b][2:-2] for b in range(8)], axis=0)
    # halo consistency: each slab's halo rows equal the neighbors' rows
    for b in range(1, 8):
        np.testing.assert_allclose(nb[b][:2], nb[b - 1][-4:-2], atol=1e-6)

    def loss_fn(grid, c, a):
        s = dataclasses.replace(
            scene, volume=dataclasses.replace(scene.volume, grid=grid),
            tfn=dataclasses.replace(scene.tfn, color=c, alpha=a))
        f = api.render(s, cfg)
        return jnp.sum((f.rgba - target.reshape(16, 16, 4)) ** 2) / (
            16 * 16 * 4)

    g = jax.grad(loss_fn, argnums=(0, 1, 2))(
        scene.volume.grid, scene.tfn.color, scene.tfn.alpha)
    want_grid = np.asarray(scene.volume.grid - lr * g[0])
    scale = np.abs(want_grid).max() + 1e-8
    # tolerance covers fp-reassociation noise amplified through the
    # straight-alpha division in finalize; indexing/normalization bugs in
    # the halo exchange show O(gradient) errors, orders above this
    d = np.abs(rebuilt - want_grid) / scale
    assert d.max() < 3e-4, d.max()
    assert d.mean() < 3e-6, d.mean()
    np.testing.assert_allclose(
        np.asarray(tfa2),
        np.clip(np.asarray(scene.tfn.alpha - lr * g[2]), 0, 1), atol=2e-4)
