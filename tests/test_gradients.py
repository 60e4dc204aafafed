"""Finite-difference checks of the differentiable render path.

The reference renderer is forward-only; differentiability is this framework's
capability extension (BASELINE.md north star). These tests pin gradients of a
pixel-loss w.r.t. the density grid, TF tables, and camera against central
finite differences.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene, StructuredVolume, TransferFunction


def _tiny_scene():
    rng = np.random.default_rng(0)
    grid = rng.uniform(0.2, 0.8, size=(6, 6, 6)).astype(np.float32)
    volume = StructuredVolume.create(grid)
    color = np.stack([np.linspace(0.1, 0.9, 6)] * 3, -1).astype(np.float32)
    alpha = np.linspace(0.05, 0.6, 6).astype(np.float32)
    tfn = TransferFunction.create(color, alpha, (0.0, 1.0))
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=50.0)
    return Scene.create(volume, tfn, camera=cam, volume_sampling_rate=8.0)


CFG = api.RenderConfig(width=6, height=6, spp=1, sampling_rate=8.0,
                       shading="none")


def _loss(scene, cfg):
    frame = api.render(scene, cfg)
    return jnp.sum(frame.rgba ** 2)


def _fd_check(scene, cfg, get, replace, n_probe=5, eps=1e-3, rtol=0.08):
    loss = lambda s: _loss(s, cfg)
    g = jax.grad(lambda leaf: loss(replace(scene, leaf)))(get(scene))
    g = np.asarray(g).ravel()
    leaf0 = np.asarray(get(scene)).astype(np.float64)
    flat = leaf0.ravel()
    rng = np.random.default_rng(1)
    # probe only coordinates with non-negligible gradient signal
    order = np.argsort(-np.abs(g))
    idxs = order[: max(n_probe * 4, 20)]
    idxs = rng.choice(idxs, size=min(n_probe, len(idxs)), replace=False)
    checked = 0
    for i in idxs:
        d = np.zeros_like(flat)
        d[i] = eps
        lp = float(loss(replace(scene, jnp.asarray(
            (flat + d).reshape(leaf0.shape), jnp.float32))))
        lm = float(loss(replace(scene, jnp.asarray(
            (flat - d).reshape(leaf0.shape), jnp.float32))))
        fd = (lp - lm) / (2 * eps)
        if abs(fd) < 1e-4 and abs(g[i]) < 1e-4:
            continue
        np.testing.assert_allclose(g[i], fd, rtol=rtol, atol=2e-3)
        checked += 1
    assert checked >= 1, "no informative coordinates probed"


def test_grad_wrt_grid():
    scene = _tiny_scene()
    cfg = CFG.resolved(scene)
    _fd_check(
        scene, cfg,
        get=lambda s: s.volume.grid,
        replace=lambda s, g: dataclasses.replace(
            s, volume=dataclasses.replace(s.volume, grid=g)),
    )


def test_grad_wrt_tf_alpha():
    scene = _tiny_scene()
    cfg = CFG.resolved(scene)
    _fd_check(
        scene, cfg,
        get=lambda s: s.tfn.alpha,
        replace=lambda s, a: dataclasses.replace(
            s, tfn=dataclasses.replace(s.tfn, alpha=a)),
    )


def test_grad_wrt_tf_color():
    scene = _tiny_scene()
    cfg = CFG.resolved(scene)
    _fd_check(
        scene, cfg,
        get=lambda s: s.tfn.color,
        replace=lambda s, c: dataclasses.replace(
            s, tfn=dataclasses.replace(s.tfn, color=c)),
    )


def test_grad_wrt_camera_position():
    scene = _tiny_scene()
    cfg = CFG.resolved(scene)

    def loss_from(from_):
        cam = dataclasses.replace(scene.camera, from_=from_)
        return _loss(dataclasses.replace(scene, camera=cam), cfg)

    f0 = np.asarray(scene.camera.from_, np.float64)
    g = np.asarray(jax.grad(loss_from)(jnp.asarray(f0, jnp.float32)))
    eps = 1e-3
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        fd = (float(loss_from(jnp.asarray(f0 + d, jnp.float32)))
              - float(loss_from(jnp.asarray(f0 - d, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.1, atol=5e-3)


def test_grad_with_gradient_shading_finite():
    """Shaded mode (normals + shadow march) must still produce finite grads."""
    scene = _tiny_scene()
    cfg = dataclasses.replace(CFG, shading="shadow").resolved(scene)
    g = jax.grad(lambda grid: _loss(dataclasses.replace(
        scene, volume=dataclasses.replace(scene.volume, grid=grid)), cfg))(
        scene.volume.grid)
    assert np.all(np.isfinite(np.asarray(g)))
