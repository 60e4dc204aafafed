"""Path-tracer tests against analytic oracles (the tracker is stochastic, so
checks are statistical: homogeneous-medium collision statistics, tracking-
method equivalence, energy bounds)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene, StructuredVolume, TransferFunction
from ovr_tpu.render import accel, pathtracer


def _const_scene(alpha=0.5, n=16):
    grid = np.full((n, n, n), 0.5, np.float32)
    volume = StructuredVolume.create(grid)
    tfn = TransferFunction.create(
        np.tile(np.array([[1.0, 0.5, 0.25]], np.float32), (4, 1)),
        np.full(4, alpha, np.float32), (0.0, 1.0))
    cam = Camera.create(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5),
                        kind="orthographic", height=0.5)
    return Scene.create(volume, tfn, camera=cam)


def _leaves(scene):
    return (scene.volume.grid, scene.tfn.color, scene.tfn.alpha,
            scene.tfn.value_range, scene.density_scale)


def test_uniform_sphere_statistics():
    u = jax.random.uniform(jax.random.PRNGKey(0), (20000, 2))
    d = np.asarray(pathtracer.uniform_sample_sphere(u))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # component means vanish, second moment is 1/3 per axis
    np.testing.assert_allclose(d.mean(0), 0.0, atol=0.02)
    np.testing.assert_allclose((d ** 2).mean(0), 1 / 3, atol=0.02)


def _collision_fraction(track_fn, scene, n=4096, key=0):
    """Fraction of straight rays through the unit cube that collide."""
    leaves = _leaves(scene)
    org = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    t0 = jnp.ones((n,), jnp.float32)
    t1 = jnp.full((n,), 2.0, jnp.float32)
    hit, t, albedo = track_fn(leaves, scene.volume.world_lo,
                              scene.volume.world_hi, org, d, t0, t1,
                              jax.random.PRNGKey(key))
    return float(jnp.mean(hit.astype(jnp.float32))), hit, t, albedo


def test_delta_tracking_global_transmittance():
    """Collision probability through a homogeneous slab of extinction
    sigma = alpha * density_scale over length L is 1 - exp(-sigma L)."""
    alpha = 0.5
    scene = _const_scene(alpha=alpha)
    cfg = pathtracer.PTConfig(max_track_steps=256)

    def track(leaves, lo, hi, org, d, t0, t1, key):
        return pathtracer.delta_track_global(leaves, lo, hi, org, d, t0, t1,
                                             key, cfg)

    frac, hit, t, albedo = _collision_fraction(track, scene)
    want = 1.0 - np.exp(-alpha * 1.0)
    np.testing.assert_allclose(frac, want, atol=0.02)
    # collision points lie inside the medium and carry the TF albedo
    tn = np.asarray(t)[np.asarray(hit)]
    assert np.all((tn >= 1.0) & (tn <= 2.0))
    a = np.asarray(albedo)[np.asarray(hit)]
    np.testing.assert_allclose(a, np.tile([[1.0, 0.5, 0.25]], (len(a), 1)),
                               atol=1e-5)


def test_delta_tracking_dda_matches_global():
    """The macrocell-majorant tracker must produce the same collision
    statistics as global-majorant tracking (identical distributions)."""
    alpha = 0.7
    scene = _const_scene(alpha=alpha, n=48)
    mc = accel.build_macrocells(scene.volume.grid, scene.tfn.alpha,
                                scene.tfn.value_range)
    cfg = pathtracer.PTConfig(max_track_steps=512)

    def track_dda(leaves, lo, hi, org, d, t0, t1, key):
        return pathtracer.delta_track_dda(leaves, lo, hi, org, d, t0, t1,
                                          key, cfg, mc)

    frac, hit, t, _ = _collision_fraction(track_dda, scene, n=4096)
    want = 1.0 - np.exp(-alpha)
    np.testing.assert_allclose(frac, want, atol=0.03)
    # collision depth distribution: mean of truncated exponential
    tn = np.asarray(t)[np.asarray(hit)] - 1.0
    s = alpha
    want_mean = 1 / s - np.exp(-s) / (1 - np.exp(-s))
    np.testing.assert_allclose(tn.mean(), want_mean, atol=0.03)


def test_dda_skips_empty_cells_exactly():
    """With an empty volume the DDA tracker must never report a collision
    and must terminate quickly."""
    scene = _const_scene(alpha=0.0, n=32)
    mc = accel.build_macrocells(scene.volume.grid, scene.tfn.alpha,
                                scene.tfn.value_range)
    cfg = pathtracer.PTConfig(max_track_steps=64)

    def track(leaves, lo, hi, org, d, t0, t1, key):
        return pathtracer.delta_track_dda(leaves, lo, hi, org, d, t0, t1,
                                          key, cfg, mc)

    frac, *_ = _collision_fraction(track, scene, n=256)
    assert frac == 0.0


def test_pt_render_frame_smoke():
    scene = _const_scene(alpha=0.4)
    mc = accel.build_macrocells(scene.volume.grid, scene.tfn.alpha,
                                scene.tfn.value_range)
    cfg = api.RenderConfig(width=8, height=8, spp=2, sampling_rate=16.0,
                           path_tracing=True, use_macrocells=True,
                           max_scatters=8).resolved(scene)
    frame = api.render(scene, cfg, key=jax.random.PRNGKey(1), macrocells=mc)
    rgba = np.asarray(frame.rgba)
    assert rgba.shape == (8, 8, 4)
    assert np.all(np.isfinite(rgba))
    # rays that hit the box report alpha 1 (shaders_pathtracing.cu:541)
    assert rgba[4, 4, 3] == 1.0
    # radiance is bounded by ambient (albedo <= 1, isotropic, no emission)
    assert rgba[..., :3].max() <= float(scene.light.ambient) + 1e-5


def test_pt_energy_increases_with_albedo():
    """Higher opacity with white albedo scatters more ambient light back."""
    vals = []
    for alpha in (0.1, 0.9):
        grid = np.full((8, 8, 8), 0.5, np.float32)
        volume = StructuredVolume.create(grid)
        tfn = TransferFunction.create(
            np.ones((4, 3), np.float32), np.full(4, alpha, np.float32),
            (0.0, 1.0))
        cam = Camera.create(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5),
                            kind="orthographic", height=0.5)
        scene = Scene.create(volume, tfn, camera=cam)
        cfg = api.RenderConfig(width=4, height=4, spp=16, sampling_rate=8.0,
                               path_tracing=True, use_macrocells=False,
                               max_scatters=16).resolved(scene)
        frame = api.render(scene, cfg, key=jax.random.PRNGKey(2))
        vals.append(float(np.asarray(frame.rgba)[..., :3].mean()))
    # with albedo 1 everything eventually escapes to ambient: both are lit,
    # but the denser medium must not lose energy
    assert vals[1] > 0.1 and vals[0] > 0.0


class TestDensePT:
    """render.ptdense: discrete-ordinates transport vs analytic sweeps and
    the Monte-Carlo tracker (distributional parity in the mean image)."""

    def test_sweep_uniform_slab_axial(self):
        from ovr_tpu.render import ptdense

        n = 16
        sig_v = 0.8
        sigma = jnp.full((n, n, n), sig_v, jnp.float32)
        spacing = np.full(3, 1.0 / n)
        t_f, _ = ptdense.sweep_direction(sigma, None, (0.0, 0.0, 1.0),
                                         spacing, include_emis=False)
        # marching +z from plane k crosses planes k..n-1
        a = 1.0 - np.exp(-sig_v / n)
        want = (1.0 - a) ** (n - np.arange(n))
        got = np.asarray(t_f)[:, 8, 8]
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # reversed direction mirrors
        t_b, _ = ptdense.sweep_direction(sigma, None, (0.0, 0.0, -1.0),
                                         spacing, include_emis=False)
        np.testing.assert_allclose(np.asarray(t_b)[:, 8, 8], want[::-1],
                                   rtol=1e-5)

    def test_sweep_diagonal_escape_bounds(self):
        from ovr_tpu.render import ptdense

        n = 16
        sigma = jnp.full((n, n, n), 0.5, jnp.float32)
        spacing = np.full(3, 1.0 / n)
        d = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
        t_f, _ = ptdense.sweep_direction(sigma, None, d, spacing,
                                         include_emis=False)
        t = np.asarray(t_f)
        assert np.all((t > 0.0) & (t <= 1.0 + 1e-6))
        # corner nearest the exit sees almost no medium
        assert t[-1, -1, -1] > t[0, 0, 0]

    def _smooth_scene(self, ambient=1.0):
        n = 24
        z, y, x = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
        g = (0.5 + 0.5 * np.sin(5 * x) * np.cos(4 * y)
             * np.sin(3 * z)).astype(np.float32)
        volume = StructuredVolume.create(g)
        tfn = TransferFunction.create(
            np.stack([np.linspace(0.2, 1.0, 8), np.full(8, 0.6),
                      np.linspace(1.0, 0.2, 8)], -1).astype(np.float32),
            (np.linspace(0, 1, 8) ** 1.5).astype(np.float32), (0.0, 1.0))
        cam = Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5),
                            fovy=40.0)
        from ovr_tpu.core.scene import Light
        light = Light.create(ambient=ambient)
        return Scene.create(volume, tfn, camera=cam, light=light)

    def test_dense_matches_mc_mean_image(self):
        """Mean premultiplied radiance of the dense solver tracks the MC
        tracker within combined lattice/quadrature bias + MC noise."""
        scene = self._smooth_scene()
        w = h = 24
        cfg_mc = api.RenderConfig(width=w, height=h, spp=48,
                                  sampling_rate=24.0, path_tracing=True,
                                  use_macrocells=False,
                                  max_scatters=8).resolved(scene)
        f_mc = api.render(scene, cfg_mc, key=jax.random.PRNGKey(5))
        mc = np.asarray(f_mc.rgba)
        mc_pm = mc[..., :3] * mc[..., 3:4]

        cfg_d = api.RenderConfig(width=w, height=h, sampling_rate=24.0,
                                 path_tracing=True, pt_dense=True,
                                 pt_lattice=48, max_scatters=8,
                                 method="auto").resolved(scene)
        assert cfg_d.sw is not None
        f_d = api.render(scene, cfg_d)
        de = np.asarray(f_d.rgba)
        de_pm = de[..., :3] * de[..., 3:4]
        # interiors only (warped silhouette vs binary box alpha)
        interior = mc[..., 3] > 0.999
        interior[:3] = interior[-3:] = False
        interior[:, :3] = interior[:, -3:] = False
        assert interior.sum() > 100
        err = np.abs(de_pm - mc_pm)[interior]
        assert err.mean() < 0.035, err.mean()
        # global energy within 20%
        assert abs(de_pm[interior].sum() - mc_pm[interior].sum()) \
            < 0.2 * mc_pm[interior].sum() + 1e-3

    def test_dense_single_scatter_tracks_mc(self):
        """max_scatters=2 (single collision): tighter parity — only the
        lattice/quadrature bias separates the two estimators."""
        scene = self._smooth_scene()
        w = h = 20
        cfg_mc = api.RenderConfig(width=w, height=h, spp=64,
                                  sampling_rate=24.0, path_tracing=True,
                                  use_macrocells=False,
                                  max_scatters=2).resolved(scene)
        f_mc = api.render(scene, cfg_mc, key=jax.random.PRNGKey(7))
        mc = np.asarray(f_mc.rgba)
        cfg_d = api.RenderConfig(width=w, height=h, sampling_rate=24.0,
                                 path_tracing=True, pt_dense=True,
                                 pt_lattice=48, max_scatters=2,
                                 method="auto").resolved(scene)
        f_d = api.render(scene, cfg_d)
        de = np.asarray(f_d.rgba)
        interior = mc[..., 3] > 0.999
        interior[:3] = interior[-3:] = False
        interior[:, :3] = interior[:, -3:] = False
        err = np.abs(de[..., :3] * de[..., 3:4]
                     - mc[..., :3] * mc[..., 3:4])[interior]
        assert err.mean() < 0.03, err.mean()

    @pytest.mark.slow
    def test_dense_renderer_facade_caches_fields(self):
        scene = self._smooth_scene()
        r = api.Renderer(scene, api.RenderConfig(
            width=12, height=12, sampling_rate=16.0, path_tracing=True,
            pt_dense=True, pt_lattice=24, method="auto"))
        r.render()
        assert r._pt_fields is not None
        out = r.mapframe()
        assert np.isfinite(out["rgba"]).all()
