"""Surface geometry: triangle meshes, isosurfaces, instances, materials,
and volume-over-surface compositing (reference scene graph features
`ovr/scene.h:267-327`, OSPRay geometry mapping `device_impl.cpp:165-268`)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import (
    Camera,
    GeometryInstance,
    Isosurface,
    Material,
    TriangleMesh,
    simple_scene,
)
from ovr_tpu.render import geometry as geo


def _quad(z=0.5, lo=0.0, hi=1.0):
    """Two triangles spanning [lo,hi]^2 at depth z."""
    verts = [[lo, lo, z], [hi, lo, z], [hi, hi, z], [lo, hi, z]]
    faces = [[0, 1, 2], [0, 2, 3]]
    return TriangleMesh.create(verts, faces)


def test_mesh_intersection_basic():
    mesh = _quad(z=2.0)
    org = jnp.array([[0.5, 0.5, 0.0], [0.5, 0.5, 5.0], [3.0, 3.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, nrm, _, _ = geo.intersect_mesh(org, d, mesh)
    np.testing.assert_allclose(np.asarray(t[:2]), [2.0, 3.0], atol=1e-5)
    assert float(t[2]) > 1e30  # miss
    # normals face the origin side
    np.testing.assert_allclose(np.asarray(nrm[0]), [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(nrm[1]), [0, 0, 1], atol=1e-5)


def test_mesh_chunking_padding():
    """Results are identical regardless of chunk size / padding."""
    rng = np.random.default_rng(0)
    verts = rng.uniform(0, 1, (30, 3)).astype(np.float32)
    faces = rng.integers(0, 30, (37, 3)).astype(np.int32)
    mesh = TriangleMesh.create(verts, faces)
    org = jnp.asarray(rng.uniform(0, 1, (64, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    t1, n1, c1, _ = geo.intersect_mesh(org, d, mesh, chunk=8)
    t2, n2, c2, _ = geo.intersect_mesh(org, d, mesh, chunk=64)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_instance_transform():
    """A translated instance intersects where the transform puts it."""
    mesh = _quad(z=0.0)
    xfm = jnp.array([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 3.0]])  # +3 in z
    inst = GeometryInstance.create(mesh, xfm=xfm)
    scene = simple_scene(np.zeros((4, 4, 4), np.float32))
    scene = dataclasses.replace(scene, geometries=(inst,))
    org = jnp.array([[0.5, 0.5, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    rgb, a, t = geo.render_geometries(scene, org, d)
    np.testing.assert_allclose(float(t[0]), 3.0, atol=1e-5)
    assert float(a[0]) == 1.0


def test_isosurface_sphere():
    """Isosurface of a radial field = a sphere; hit distance is analytic."""
    n = 48
    z, y, x = np.meshgrid(*(np.linspace(0, 1, n, dtype=np.float32),) * 3,
                          indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    grid = (1.0 - r).astype(np.float32)  # 1 at center, decreasing outward
    scene = simple_scene(grid, value_range=(0.0, 1.0))
    iso = Isosurface.create(0.75)  # sphere of radius 0.25
    t, nrm = geo.intersect_isosurface(
        scene.volume.grid, scene.tfn.value_range, scene.volume.world_lo,
        scene.volume.world_hi, jnp.array([[0.5, 0.5, -1.0]]),
        jnp.array([[0.0, 0.0, 1.0]]), iso, steps=256)
    # entry at z = 0.5 - 0.25 -> t = 1.25 (+/- one-voxel discretization)
    np.testing.assert_allclose(float(t[0]), 1.25, atol=1e-2)
    np.testing.assert_allclose(np.asarray(nrm[0]), [0, 0, -1], atol=5e-2)


def test_volume_composites_over_mesh(small_grid):
    """A backdrop quad shows through where the volume is thin, and the
    volume march stops at the surface."""
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=60.0)
    scene = dataclasses.replace(scene, camera=cam)
    quad = _quad(z=2.0, lo=-3.0, hi=3.0)
    red = Material.create(kd=(1.0, 0.0, 0.0), ks=(0, 0, 0))
    inst = GeometryInstance.create(quad, material=red)
    scene_geo = dataclasses.replace(scene, geometries=(inst,))

    cfg = api.RenderConfig(width=24, height=24, sampling_rate=32.0,
                           shading="none").resolved(scene)
    plain = np.asarray(api.render(scene, cfg).rgba)
    with_geo = np.asarray(api.render(scene_geo, cfg).rgba)
    # every pixel now has full coverage (backdrop alpha = 1)
    np.testing.assert_allclose(with_geo[..., 3], 1.0, atol=1e-5)
    # red layer raises the red channel where the volume was transparent
    assert (with_geo[..., 0] >= plain[..., 0] - 1e-5).all()
    assert with_geo[..., 0].mean() > plain[..., 0].mean()


def test_phong_material_shading():
    mat = Material.create(kd=(0.5, 0.5, 0.5), ks=(1.0, 1.0, 1.0), ns=50.0)
    from ovr_tpu.core.scene import Light
    light = Light.create(direction=(0, 0, -1), color=(1, 1, 1), ambient=0.0)
    nrm = jnp.array([[0.0, 0.0, -1.0]])
    ldir = jnp.array([0.0, 0.0, -1.0])
    vdir = jnp.array([[0.0, 0.0, -1.0]])
    rgb = geo.shade_phong(mat, jnp.ones((1, 3)), nrm, light, ldir, vdir)
    # head-on: diffuse 0.5 + specular 1.0
    np.testing.assert_allclose(np.asarray(rgb[0]), [1.5] * 3, atol=1e-5)


def test_shearwarp_geometry_parity(small_grid):
    """Geometry scenes are shear-warp eligible: surfaces are intersected
    on the fan rays, clamp the per-pixel volume interval, and composite
    behind — parity vs the march's t_cap + background blend."""
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5),
                        fovy=60.0)
    quad = _quad(z=0.8, lo=-3.0, hi=3.0)  # inside the volume: true t_cap
    red = Material.create(kd=(1.0, 0.0, 0.0), ks=(0, 0, 0))
    scene = dataclasses.replace(
        scene, camera=cam,
        geometries=(GeometryInstance.create(quad, material=red),))

    cfg_m = api.RenderConfig(width=48, height=40, sampling_rate=48.0,
                             shading="none").resolved(scene)
    cfg_s = dataclasses.replace(cfg_m, method="shearwarp").resolved(scene)
    assert cfg_s.sw is not None
    fm = api.render(scene, cfg_m)
    fs = api.render(scene, cfg_s)
    pm = np.asarray(fm.rgba[..., :3] * fm.rgba[..., 3:4])
    ps = np.asarray(fs.rgba[..., :3] * fs.rgba[..., 3:4])
    interior = np.zeros(pm.shape[:2], bool)
    interior[3:-3, 3:-3] = True
    err = np.abs(pm - ps).max(-1)[interior]
    assert np.quantile(err, 0.95) < 0.06, np.quantile(err, 0.95)
    # the backdrop fills coverage in both
    np.testing.assert_allclose(np.asarray(fs.rgba[..., 3])[interior], 1.0,
                               atol=0.05)


def test_sample_texture_bilinear():
    """sample_texture: corner-exact fetches + interior bilinear blend."""
    tex = jnp.asarray(np.array(
        [[[1, 0, 0], [0, 1, 0]],
         [[0, 0, 1], [1, 1, 1]]], np.float32))  # 2x2 texture
    # v up: uv (0,1) = image row 0 col 0 = red; (1,0) = row 1 col 1 = white
    uv = jnp.asarray([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [1.0, 0.0],
                      [0.5, 0.5]], jnp.float32)
    out = np.asarray(geo.sample_texture(tex, uv))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[3], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[4], [0.5, 0.5, 0.5], atol=1e-6)


def test_map_kd_textured_mesh():
    """A map_kd-textured quad shades with the texture's diffuse color
    (reference ObjMaterial.map_kd, ovr/scene.h:279, resolved at
    ovr/devices/ospray/device_impl.cpp:274-295)."""
    verts = [[0.0, 0.0, 0.5], [1.0, 0.0, 0.5], [1.0, 1.0, 0.5],
             [0.0, 1.0, 0.5]]
    faces = [[0, 1, 2], [0, 2, 3]]
    uvs = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]
    # left half red, right half green, constant along v
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4, 0] = 1.0
    tex[:, 4:, 1] = 1.0
    mesh = TriangleMesh.create(verts, faces, uvs=uvs)
    mat = Material.create(kd=(1.0, 1.0, 1.0), map_kd=tex)
    inst = GeometryInstance.create(mesh, mat)
    scene = simple_scene(np.zeros((4, 4, 4), np.float32))
    scene = dataclasses.replace(scene, geometries=(inst,))
    org = jnp.asarray([[0.2, 0.5, 0.0], [0.8, 0.5, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 2, jnp.float32)
    rgb, a, t = geo.render_geometries(scene, org, d)
    rgb = np.asarray(rgb)
    assert rgb[0, 0] > 4 * max(rgb[0, 1], 1e-6)  # left ray: red dominates
    assert rgb[1, 1] > 4 * max(rgb[1, 0], 1e-6)  # right ray: green


def test_usda_mesh_with_map_kd(tmp_path):
    """USDA subset: Mesh prims with texcoords + a map_kd texture load into
    scene.geometries."""
    import shutil
    np.save(tmp_path / "tex.npy",
            np.full((4, 4, 3), 0.25, np.float32))
    shutil.copy("tests/fixtures/scene_tiny.json", tmp_path / "scene.json")
    shutil.copy("tests/fixtures/tiny_vorts.raw", tmp_path / "tiny_vorts.raw")
    usda = '''#usda 1.0
def "scene" {
    def "volume" {
        string data_path = "scene.json"
    }
    def Mesh "quad" {
        point3f[] points = [(0,0,0.5), (1,0,0.5), (1,1,0.5), (0,1,0.5)]
        int[] faceVertexIndices = [0,1,2, 0,2,3]
        texCoord2f[] primvars:st = [(0,0), (1,0), (1,1), (0,1)]
        color3f diffuseColor = (0.9, 0.8, 0.7)
        float opacity = 0.5
        string map_kd = "tex.npy"
    }
}
'''
    (tmp_path / "scene.usda").write_text(usda)
    from ovr_tpu.io.usda import create_scene_usda
    scene, settings = create_scene_usda(str(tmp_path / "scene.usda"))
    assert len(scene.geometries) == 1
    inst = scene.geometries[0]
    assert inst.material.map_kd is not None
    assert inst.material.map_kd.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(inst.material.kd),
                               [0.9, 0.8, 0.7], atol=1e-6)
    assert float(inst.material.d) == 0.5
    assert inst.geometry.uvs.shape == (4, 2)
