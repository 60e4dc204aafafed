"""Renderer registry (dylink equivalent) + image-op chain + colormap keys."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from ovr_tpu import api, registry
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.io.colormaps import available_colormaps, create_colormap
from ovr_tpu.render import imageops


@pytest.fixture
def scene(small_grid):
    s = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5))
    return dataclasses.replace(s, camera=cam)


class TestRegistry:
    def test_builtins_present(self):
        names = registry.available_renderers()
        for n in ("raymarch", "pathtracer", "optix7", "ospray"):
            assert n in names

    def test_create_builtin(self, scene):
        r = registry.create_renderer(
            "raymarch", scene,
            cfg=api.RenderConfig(width=16, height=16, sampling_rate=8.0,
                                 shading="none"))
        assert isinstance(r, api.Renderer)

    def test_register_and_resolve_custom(self, scene):
        calls = []

        @registry.register_renderer("testdev")
        def make(sc, **kw):
            calls.append(sc)
            return "sentinel"

        assert registry.create_renderer("testdev", scene) == "sentinel"
        assert calls == [scene]

    def test_unknown_raises(self, scene):
        with pytest.raises(KeyError):
            registry.create_renderer("no_such_device", scene)


class TestImageOps:
    def _frame(self):
        rgba = jnp.concatenate(
            [jnp.full((4, 4, 3), 0.5), jnp.full((4, 4, 1), 0.5)], -1)
        return api.Frame(rgba=rgba, grad=jnp.zeros((4, 4, 3)))

    def test_chain_order_and_alpha(self):
        f = self._frame()
        post = imageops.chain(imageops.exposure(1.0),
                              imageops.reinhard_tonemap(),
                              imageops.gamma(2.0))
        out = post(f)
        # 0.5 * 2 = 1.0 -> reinhard 0.5 -> gamma sqrt
        np.testing.assert_allclose(np.asarray(out.rgba[..., 0]),
                                   np.sqrt(0.5), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.rgba[..., 3]), 0.5)

    def test_background_composite(self):
        f = self._frame()
        out = imageops.composite_background((1.0, 1.0, 1.0))(f)
        np.testing.assert_allclose(np.asarray(out.rgba[..., 0]), 0.75)
        np.testing.assert_allclose(np.asarray(out.rgba[..., 3]), 1.0)

    def test_aces_clamps(self):
        f = self._frame()
        out = imageops.aces_tonemap()(imageops.exposure(4.0)(f))
        x = np.asarray(out.rgba[..., :3])
        assert x.min() >= 0.0 and x.max() <= 1.0

    def test_denoise_hook(self):
        f = self._frame()
        out = imageops.chain(imageops.denoise(
            lambda fr: dataclasses.replace(fr, rgba=fr.rgba * 0)))(f)
        assert float(jnp.sum(out.rgba)) == 0.0


class TestColormaps:
    def test_all_reference_keys_resolve(self):
        # the 50 embedded keys of extern/tfn/colormaps/colormap.h
        names = [n for n in available_colormaps() if "/" in n]
        assert len(names) == 50
        for n in names:
            t = create_colormap(n, resolution=32)
            assert t.shape == (32, 3)
            assert t.min() >= 0.0 and t.max() <= 1.0

    def test_reference_value_parity_brbg(self):
        """First control point of diverging/BrBG matches the embedded table
        (extern/tfn/colormaps/diverging/BrBG.txt row 0)."""
        t = create_colormap("diverging/BrBG", resolution=256)
        np.testing.assert_allclose(
            t[0], [0.3294117647, 0.1882352941, 0.0196078431], atol=1e-3)
