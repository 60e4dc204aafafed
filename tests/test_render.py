"""End-to-end ray-march renderer tests against analytic oracles."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene, StructuredVolume, TransferFunction, simple_scene


def _const_scene(value=0.5, alpha_of_value=0.3, rate=32.0):
    """Homogeneous volume: TF alpha is constant alpha_of_value everywhere."""
    grid = np.full((8, 8, 8), value, np.float32)
    volume = StructuredVolume.create(grid)
    color = np.tile(np.array([[0.2, 0.4, 0.8]], np.float32), (4, 1))
    alpha = np.full(4, alpha_of_value, np.float32)
    tfn = TransferFunction.create(color, alpha, (0.0, 1.0))
    cam = Camera.create(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5),
                        height=1.0, kind="orthographic")
    return Scene.create(volume, tfn, camera=cam, volume_sampling_rate=rate)


def test_homogeneous_alpha_analytic():
    """Total alpha along a full traversal is 1-(1-a)^L exactly (opacity
    correction telescopes: prod over steps of (1-a)^(step_i) = (1-a)^L)."""
    a = 0.3
    scene = _const_scene(alpha_of_value=a, rate=32.0)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=32.0,
                           shading="none").resolved(scene)
    frame = api.render(scene, cfg)
    rgba = np.asarray(frame.rgba)
    # central pixels traverse the full unit cube: L = 1
    expect = 1.0 - (1.0 - a) ** 1.0
    np.testing.assert_allclose(rgba[4, 4, 3], expect, rtol=1e-4)
    # straight color equals the TF color for a homogeneous volume
    np.testing.assert_allclose(rgba[4, 4, :3], [0.2, 0.4, 0.8], rtol=1e-4)


def test_alpha_independent_of_rate():
    """Opacity correction makes composited alpha step-size invariant."""
    outs = []
    for rate in (16.0, 64.0):
        scene = _const_scene(alpha_of_value=0.7, rate=rate)
        cfg = api.RenderConfig(width=4, height=4, spp=1, sampling_rate=rate,
                               shading="none").resolved(scene)
        outs.append(np.asarray(api.render(scene, cfg).rgba)[2, 2, 3])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3)


def test_outside_rays_transparent():
    scene = _const_scene()
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=32.0,
                           shading="none").resolved(scene)
    # orthographic camera with plane height 4: corner rays miss the unit box
    cam = Camera.create(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5),
                        height=4.0, kind="orthographic")
    rgba = np.asarray(api.render(scene, cfg, camera=cam).rgba)
    assert rgba[0, 0, 3] == 0.0
    assert rgba[8, 8, 3] > 0.1


def test_render_smoke_perspective_shaded(small_grid):
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=45.0)
    cfg = api.RenderConfig(width=24, height=16, spp=2, sampling_rate=24.0,
                           shading="shadow").resolved(scene)
    frame = api.render(scene, cfg, camera=cam)
    rgba = np.asarray(frame.rgba)
    grad = np.asarray(frame.grad)
    assert rgba.shape == (16, 24, 4) and grad.shape == (16, 24, 3)
    assert np.all(np.isfinite(rgba)) and np.all(np.isfinite(grad))
    assert np.all(rgba[..., 3] >= 0) and np.all(rgba[..., 3] <= 1 + 1e-5)
    assert rgba[..., 3].max() > 0.05


def test_fast_math_matches_scan(small_grid):
    scene = simple_scene(small_grid)
    cfg = api.RenderConfig(width=12, height=12, spp=1, sampling_rate=24.0,
                           shading="diffuse").resolved(scene)
    a = np.asarray(api.render(scene, cfg).rgba)
    cfg2 = dataclasses.replace(cfg, fast_math=True)
    b = np.asarray(api.render(scene, cfg2).rgba)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_early_exit_saturates():
    scene = _const_scene(alpha_of_value=0.9999, rate=64.0)
    cfg = api.RenderConfig(width=4, height=4, spp=1, sampling_rate=64.0,
                           shading="none").resolved(scene)
    rgba = np.asarray(api.render(scene, cfg).rgba)
    assert rgba[2, 2, 3] > 0.999


def test_accumulation_reduces_noise(small_grid):
    scene = simple_scene(small_grid)
    cfg = api.RenderConfig(width=8, height=8, spp=4, sampling_rate=16.0,
                           shading="none", jitter_rays=True).resolved(scene)
    accum = None
    frames = []
    for i in range(1, 4):
        f = api.render(scene, cfg, frame_index=jnp.int32(i))
        disp, accum = api.accumulate(f, accum, i)
        frames.append(np.asarray(disp.rgba))
    # accumulated frame is the mean of the individual frames
    mean = np.mean(
        [np.asarray(api.render(scene, cfg, frame_index=jnp.int32(i)).rgba)
         for i in range(1, 4)], axis=0)
    np.testing.assert_allclose(frames[-1], mean, atol=1e-5)


def test_renderer_facade_lifecycle(small_grid):
    scene = simple_scene(small_grid)
    r = api.Renderer(scene, api.RenderConfig(width=8, height=8, spp=1,
                                             sampling_rate=16.0,
                                             shading="none"))
    r.set_camera(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5))
    r.commit()
    r.render()
    out = r.mapframe()
    assert out["rgba"].shape == (8, 8, 4)
    r.set_volume_sampling_rate(24.0)
    r.render()
    out2 = r.mapframe()
    assert np.all(np.isfinite(out2["rgba"]))


def test_shadow_lightgrid_matches_exact_march(small_grid):
    """Precomputed light-transmittance lattice vs the exact per-sample shadow
    march (shaders_raymarching.cu:44-85 semantics): trilinear reconstruction
    error only."""
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=45.0)
    cfg = api.RenderConfig(width=24, height=24, spp=1, sampling_rate=24.0,
                           shading="shadow", shadow_grid=False).resolved(scene)
    exact = np.asarray(api.render(scene, cfg, camera=cam).rgba)
    cfg2 = dataclasses.replace(cfg, shadow_grid=True)
    approx = np.asarray(api.render(scene, cfg2, camera=cam).rgba)
    assert np.abs(exact - approx).max() < 0.05
    assert np.abs(exact - approx).mean() < 0.005


def test_ssh_single_shade_heuristic(small_grid):
    """vnr SINGLE_SHADE_HEURISTIC (method_optix.cu:218-244): one deferred
    shadow at the peak-contribution sample, blended over the unshaded
    composite."""
    scene = simple_scene(small_grid)
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=24.0,
                           shading="ssh").resolved(scene)
    f = np.asarray(api.render(scene, cfg).rgba)
    assert np.all(np.isfinite(f))
    cfg_none = dataclasses.replace(cfg, shading="none")
    f_none = np.asarray(api.render(scene, cfg_none).rgba)
    # same alpha (shading does not change opacity), different color
    np.testing.assert_allclose(f[..., 3], f_none[..., 3], atol=1e-5)
    assert np.abs(f[..., :3] - f_none[..., :3]).max() > 1e-3
    # fast-math path agrees
    cfg_fm = dataclasses.replace(cfg, fast_math=True)
    f_fm = np.asarray(api.render(scene, cfg_fm).rgba)
    np.testing.assert_allclose(f, f_fm, atol=1e-5)


def test_adaptive_sampling_parity_and_skip():
    """Majorant-scaled stepping (vnr method_optix.cu:70-108): on a mostly
    empty volume, adaptive output stays within tolerance of fixed-step."""
    from ovr_tpu.render import accel

    n = 48
    z, y, x = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    r2 = (x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2
    g = np.where(r2 < 0.03, 0.9, 0.0).astype(np.float32)  # small dense blob
    scene = simple_scene(g)
    cam = Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5), fovy=45.0)
    mc = accel.build_macrocells(scene.volume.grid, scene.tfn.alpha,
                                scene.tfn.value_range)
    cfg = api.RenderConfig(width=24, height=24, spp=1, sampling_rate=96.0,
                           shading="none", use_macrocells=True).resolved(scene)
    fixed = np.asarray(api.render(scene, cfg, camera=cam,
                                  macrocells=mc).rgba)
    cfg_ad = dataclasses.replace(cfg, adaptive_scale=8.0)
    adap = np.asarray(api.render(scene, cfg_ad, camera=cam,
                                 macrocells=mc).rgba)
    assert np.abs(fixed - adap).max() < 0.06
    assert np.abs(fixed - adap).mean() < 0.01


def test_ray_chunk_matches_whole_frame(small_grid):
    scene = simple_scene(small_grid)
    cfg = api.RenderConfig(width=20, height=12, spp=1, sampling_rate=24.0,
                           shading="diffuse").resolved(scene)
    whole = np.asarray(api.render(scene, cfg).rgba)
    cfg_ch = dataclasses.replace(cfg, ray_chunk=100)  # 240 rays -> 3 chunks
    chunked = np.asarray(api.render(scene, cfg_ch).rgba)
    np.testing.assert_allclose(whole, chunked, atol=1e-6)
