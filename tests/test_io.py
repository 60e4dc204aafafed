"""IO tests: raw loader, TF JSON, VIDI3D scenes, image writers."""

import base64
import json
import os

import numpy as np
import pytest

from ovr_tpu.core.types import ValueType
from ovr_tpu.io import colormaps, image, raw, tfn, vidi3d


def test_raw_loader_float(tmp_path, rng):
    data = rng.uniform(size=(4, 5, 6)).astype(np.float32)  # (Z, Y, X)
    path = tmp_path / "vol.raw"
    data.tofile(path)
    grid, vr = raw.load_raw_volume(str(path), (6, 5, 4), ValueType.FLOAT)
    np.testing.assert_array_equal(grid, data)
    assert vr == (float(data.min()), float(data.max()))


def test_raw_loader_uint8_normalized(tmp_path):
    data = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    path = tmp_path / "vol.raw"
    data.tofile(path)
    # default: native u8 residency (normalized-int texture semantics,
    # array.h:68-106); value range reported in normalized units
    grid, vr = raw.load_raw_volume(str(path), (2, 2, 2), "UNSIGNED_BYTE")
    assert grid.dtype == np.uint8
    np.testing.assert_array_equal(grid, data)
    assert abs(vr[1] - 7 / 255.0) < 1e-7
    # opt-out: eager f32 normalization
    gridf, _ = raw.load_raw_volume(str(path), (2, 2, 2), "UNSIGNED_BYTE",
                                   native_dtype=False)
    np.testing.assert_allclose(gridf, data.astype(np.float32) / 255.0)


def test_raw_loader_big_endian_offset(tmp_path):
    data = np.array([[[1.5, -2.5]]], np.float32)
    path = tmp_path / "vol.raw"
    with open(path, "wb") as f:
        f.write(b"HDR!")  # 4-byte header
        f.write(data.astype(">f4").tobytes())
    grid, _ = raw.load_raw_volume(str(path), (2, 1, 1), ValueType.FLOAT,
                                  offset=4, big_endian=True)
    np.testing.assert_array_equal(grid, data)


def test_raw_loader_int16(tmp_path):
    data = np.array([-32767, 0, 16384, 32767], np.int16).reshape(1, 1, 4)
    path = tmp_path / "v.raw"
    data.tofile(path)
    grid, _ = raw.load_raw_volume(str(path), (4, 1, 1), "SHORT")
    np.testing.assert_allclose(
        grid.ravel(), [-1.0, 0.0, 16384 / 32767, 1.0], atol=1e-6)


def test_raw_loader_size_mismatch(tmp_path):
    path = tmp_path / "v.raw"
    np.zeros(4, np.float32).tofile(path)
    with pytest.raises(ValueError):
        raw.load_raw_volume(str(path), (4, 4, 4), ValueType.FLOAT)


def test_tfn_base64_roundtrip():
    alpha = np.linspace(0, 1, 64).astype(np.float32)
    color = np.stack([alpha] * 3, -1)
    js = tfn.save_tfn_json(color, alpha)
    tf = tfn.load_tfn_json(js)
    c2, a2 = tf.rasterize()
    np.testing.assert_allclose(a2, alpha, atol=1e-7)
    assert tf.resolution == 64


def test_tfn_color_controls_rasterization():
    js = {
        "resolution": 8,
        "colorControls": [
            {"position": 0.0, "color": {"r": 0, "g": 0, "b": 0}},
            {"position": 1.0, "color": {"r": 1, "g": 1, "b": 1}},
        ],
    }
    tf = tfn.load_tfn_json(js)
    color, alpha = tf.rasterize()
    # rasterized at (i+0.5)/8
    np.testing.assert_allclose(color[:, 0], (np.arange(8) + 0.5) / 8, atol=1e-6)
    np.testing.assert_array_equal(alpha, np.zeros(8))


def test_tfn_gaussian_and_opacity_controls():
    js = {
        "resolution": 128,
        "gaussianObjects": [{"mean": 0.5, "sigma": 0.1, "heightFactor": 0.1}],
        "opacityControl": [
            {"position": {"x": 0.0, "y": 0.2}},
            {"position": {"x": 1.0, "y": 0.2}},
        ],
    }
    tf = tfn.load_tfn_json(js)
    _, alpha = tf.rasterize()
    peak = 0.1 / (0.1 * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(alpha[64], min(peak, 1.0), rtol=0.01)
    # far from the gaussian, the opacity control floor (0.2) wins
    np.testing.assert_allclose(alpha[0], 0.2, atol=0.02)


def test_vidi3d_checked_in_fixture_renders():
    """Smoke the reader + renderer on a checked-in real config + tiny
    binary volume (schema mirrors `data/configs/scene_vorts1.json`:
    multi-candidate fileName, BIG_ENDIAN float raw, base64 alphaArray,
    colorControls, scalarMappingRange, sampleDistance)."""
    import dataclasses

    from ovr_tpu import api

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "scene_tiny.json")
    scene = vidi3d.create_scene(path)
    assert scene.volume.grid.shape == (16, 16, 16)
    g = np.asarray(scene.volume.grid)
    assert np.isfinite(g).all() and g.max() > 5.0  # endian decoded
    assert float(scene.camera.fovy) == 45.0
    cfg = api.RenderConfig(width=24, height=24, spp=1,
                           sampling_rate=float(
                               scene.volume_sampling_rate),
                           shading="diffuse").resolved(scene)
    frame = api.render(scene, cfg)
    rgba = np.asarray(frame.rgba)
    assert np.isfinite(rgba).all()
    assert rgba[..., 3].max() > 0.3  # something rendered


def test_vidi3d_scene_end_to_end(tmp_path, rng):
    vol = rng.uniform(size=(8, 8, 8)).astype(np.uint16)
    vol_path = tmp_path / "v.raw"
    vol.tofile(vol_path)
    alpha = np.linspace(0, 1, 32).astype("<f4")
    scene_js = {
        "version": "VIDI3D",
        "dataSource": [{
            "format": "REGULAR_GRID_RAW_BINARY",
            "fileName": ["missing.raw", "v.raw"],
            "dimensions": {"x": 8, "y": 8, "z": 8},
            "type": "UNSIGNED_SHORT",
            "offset": 0,
            "endian": "LITTLE_ENDIAN",
        }],
        "view": {
            "camera": {
                "eye": {"x": 4, "y": 4, "z": -20},
                "center": {"x": 4, "y": 4, "z": 4},
                "up": {"x": 0, "y": 1, "z": 0},
                "fovy": 45,
            },
            "volume": {
                "sampleDistance": 0.5,
                "scalarMappingRange": {"minimum": 0.0, "maximum": 0.5},
                "transferFunction": {
                    "alphaArray": {
                        "encoding": "BASE64",
                        "data": base64.b64encode(alpha.tobytes()).decode(),
                    },
                    "colorControls": [
                        {"position": 0, "color": {"r": 0, "g": 0, "b": 1}},
                        {"position": 1, "color": {"r": 1, "g": 0, "b": 0}},
                    ],
                },
            },
            "lightSource": {
                "type": "DIRECTIONAL_LIGHT",
                "position": {"x": 1, "y": 2, "z": 3},
                "diffuse": {"r": 1, "g": 1, "b": 1},
            },
        },
    }
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(scene_js))
    scene = vidi3d.create_scene(str(path))
    assert scene.volume.grid.shape == (8, 8, 8)
    # world box = dims (spacing 1, origin 0)
    np.testing.assert_array_equal(np.asarray(scene.volume.world_hi), [8, 8, 8])
    # uint16 scalarMappingRange 0.5 -> raw 0.5*65535 -> normalized 0.5
    np.testing.assert_allclose(
        np.asarray(scene.tfn.value_range), [0.0, 0.5], atol=1e-5)
    assert float(scene.volume_sampling_rate) == 2.0
    assert scene.tfn.alpha.shape == (32,)
    # alpha[0] < 0.01 zeroed by the serializer end-bin cleanup
    assert float(scene.tfn.alpha[0]) == 0.0
    # renders without error
    from ovr_tpu import api
    cfg = api.RenderConfig(width=4, height=4, spp=1, sampling_rate=0.25,
                           shading="none").resolved(scene)
    frame = api.render(scene, cfg)
    assert np.all(np.isfinite(np.asarray(frame.rgba)))


def test_png_roundtrip(tmp_path, rng):
    img = rng.uniform(size=(8, 10, 4)).astype(np.float32)
    path = tmp_path / "out.png"
    image.save_image(str(path), img)
    from PIL import Image
    back = np.asarray(Image.open(path))[::-1]
    np.testing.assert_allclose(back, image.to_uint8(img), atol=1)


def test_exr_roundtrip(tmp_path, rng):
    img = rng.normal(size=(6, 7, 3)).astype(np.float32)
    path = tmp_path / "out.exr"
    image.save_exr(str(path), img, flip=False)
    back = image.load_exr(str(path))
    np.testing.assert_allclose(back, img, atol=1e-7)


def test_colormaps():
    for name in ("rainbow", "grayscale", "viridis"):
        cm = colormaps.create_colormap(name, 64)
        assert cm.shape == (64, 3)
        assert cm.min() >= 0 and cm.max() <= 1
    assert "rainbow" in colormaps.available_colormaps()


def test_all_reference_colormap_keys_resolve_without_matplotlib(monkeypatch):
    """Every reference colormap key (extern/tfn/colormaps/colormap.h:22-74)
    resolves from the frozen tables with matplotlib unavailable."""
    import builtins

    real_import = builtins.__import__

    def no_mpl(name, *a, **k):
        if name.startswith("matplotlib"):
            raise ImportError("blocked")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_mpl)
    keys = [f"{ns}/{m}" for ns, maps in colormaps._REFERENCE_KEYS.items()
            for m in maps]
    assert len(keys) == 50
    for k in keys:
        tab = colormaps.create_colormap(k, 64)
        assert tab.shape == (64, 3) and np.isfinite(tab).all()
    # bare names resolve through the frozen set too
    v = colormaps.create_colormap("viridis", 16)
    assert v.shape == (16, 3)
