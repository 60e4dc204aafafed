"""Scene model as JAX PyTrees.

Replaces the reference's POD scene graph (`ovr/scene.h:201-371`) with
registered dataclasses whose array leaves trace/jit/differentiate. Everything
a gradient can flow to — the density grid, the transfer-function tables, the
camera vectors, light parameters — is a dynamic leaf; structural choices
(camera projection kind, volume dims) are static metadata derived from shapes
or marked static.

World convention: a structured volume occupies the axis-aligned box
[world_lo, world_hi] (the reference's OptiX backend renders the unit cube
[0,1]^3 per instance, `ovr/devices/optix7/shaders_common.h:379-392`); sampling
coordinates inside the box are normalized to [0,1]^3 like a CUDA 3D texture
with clamp addressing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pytree_dataclass(cls=None, *, static: tuple[str, ...] = ()):
    """Register a dataclass as a pytree, with `static` fields as metadata."""
    if cls is None:
        return partial(_pytree_dataclass, static=static)
    cls = dataclasses.dataclass(frozen=True)(cls)
    names = [f.name for f in dataclasses.fields(cls)]
    data_fields = [n for n in names if n not in static]
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=list(static)
    )


def _as_f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


PERSPECTIVE = "perspective"
ORTHOGRAPHIC = "orthographic"


@_pytree_dataclass(static=("kind",))
class Camera:
    """Look-at camera (reference: `ovr/scene.h:201-231`).

    `from_` / `at` / `up` are world-space vectors; `fovy` is the vertical field
    of view in degrees for perspective, and for orthographic cameras `height`
    is the world-space height of the image plane.
    """

    from_: jnp.ndarray  # (3,)
    at: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    fovy: jnp.ndarray  # () degrees
    height: jnp.ndarray  # () world units, orthographic only
    kind: str = PERSPECTIVE

    @staticmethod
    def create(from_, at, up=(0.0, 1.0, 0.0), fovy=60.0, height=1.0,
               kind: str = PERSPECTIVE) -> "Camera":
        return Camera(
            from_=_as_f32(from_), at=_as_f32(at), up=_as_f32(up),
            fovy=_as_f32(fovy), height=_as_f32(height), kind=kind,
        )


@_pytree_dataclass
class TransferFunction:
    """1D transfer function: color table + opacity table + raw value range.

    `color` is (Nc, 3) RGB nodes, `alpha` is (Na,) opacity nodes; both are
    sampled piecewise-linearly over the normalized data range. `value_range`
    is in *normalized* sample units (the units of the volume after
    normalized-integer conversion) — the reference stores the same on
    `DeviceStructuredRegularVolume.{volume.lower, volume.upper}`
    (`ovr/devices/optix7/volume.cpp:131-154`).
    """

    color: jnp.ndarray  # (Nc, 3)
    alpha: jnp.ndarray  # (Na,)
    value_range: jnp.ndarray  # (2,)

    @staticmethod
    def create(color, alpha, value_range=(0.0, 1.0)) -> "TransferFunction":
        color = _as_f32(color)
        if color.ndim == 2 and color.shape[1] == 4:
            color = color[:, :3]
        return TransferFunction(
            color=color, alpha=_as_f32(alpha), value_range=_as_f32(value_range)
        )

    @property
    def resolution(self) -> int:
        return self.alpha.shape[0]


@_pytree_dataclass
class StructuredVolume:
    """A structured-regular scalar grid in a world-space box.

    `grid` has shape (Z, Y, X), float32, already normalized per
    `core.types.normalize_array`. Sampling uses CUDA-texture conventions:
    normalized coordinates p in [0,1]^3 address texel centers at
    (i + 0.5) / dims with clamp addressing and trilinear filtering.
    """

    grid: jnp.ndarray  # (Z, Y, X); float32, bfloat16 or native uint8/16
    world_lo: jnp.ndarray  # (3,)
    world_hi: jnp.ndarray  # (3,)
    data_range: jnp.ndarray  # (2,) actual min/max of grid (normalized units)

    @staticmethod
    def create(grid, world_lo=(0.0, 0.0, 0.0), world_hi=(1.0, 1.0, 1.0),
               data_range=None) -> "StructuredVolume":
        # compact storage dtypes stay native: u8/u16 sample as
        # normalized-integer textures (`ovr/devices/optix7/array.h:68-106`,
        # scale = 1/int_max applied by the samplers), bf16 as-is
        dt = getattr(grid, "dtype", None)
        if dt is not None and np.dtype(dt) in (np.dtype(np.uint8),
                                               np.dtype(np.uint16)):
            grid = jnp.asarray(grid)
            scale = 1.0 / float(np.iinfo(np.dtype(dt)).max)
        elif dt is not None and dt == jnp.bfloat16:
            grid = jnp.asarray(grid)
            scale = 1.0
        else:
            grid = _as_f32(grid)
            scale = 1.0
        if data_range is None:
            if hasattr(grid, "devices"):  # jax array: reduce on device
                data_range = (float(grid.min()) * scale,
                              float(grid.max()) * scale)
            else:
                gnp = np.asarray(grid)
                data_range = (float(gnp.min()) * scale,
                              float(gnp.max()) * scale)
        return StructuredVolume(
            grid=grid, world_lo=_as_f32(world_lo), world_hi=_as_f32(world_hi),
            data_range=_as_f32(data_range),
        )

    @property
    def dims(self) -> tuple[int, int, int]:
        """(X, Y, Z) dims, reference ordering (`ovr/scene.h:239-249`)."""
        z, y, x = self.grid.shape
        return (x, y, z)


@_pytree_dataclass
class Material:
    """OBJ-style surface material (reference: `ovr/scene.h:266-282`).

    `kd` diffuse RGB, `ks` specular RGB, `ns` shininess exponent, `d`
    opacity. `map_kd` is an optional (H, W, 3) diffuse texture sampled at
    the mesh's per-vertex UVs (the reference's `ObjMaterial.map_kd`
    texture index, resolved to an OSPRay texture at
    `ovr/devices/ospray/device_impl.cpp:274-295`); None = untextured.
    """

    kd: jnp.ndarray  # (3,)
    ks: jnp.ndarray  # (3,)
    ns: jnp.ndarray  # ()
    d: jnp.ndarray  # ()
    map_kd: Optional[jnp.ndarray] = None  # (H, W, 3) or None

    @staticmethod
    def create(kd=(0.8, 0.8, 0.8), ks=(0.0, 0.0, 0.0), ns=10.0,
               d=1.0, map_kd=None) -> "Material":
        return Material(kd=_as_f32(kd), ks=_as_f32(ks), ns=_as_f32(ns),
                        d=_as_f32(d),
                        map_kd=None if map_kd is None else _as_f32(map_kd))


@_pytree_dataclass
class TriangleMesh:
    """Indexed triangle mesh geometry (reference: `ovr/scene.h:284-304`,
    `GeometryTriangles`). Optional per-vertex colors override the material
    diffuse; `uvs` are per-vertex texture coordinates (the reference's
    `verts.texcoord`) consumed by `Material.map_kd`."""

    verts: jnp.ndarray  # (V, 3)
    faces: jnp.ndarray  # (F, 3) int32
    colors: jnp.ndarray  # (V, 3); ones = use material kd
    uvs: jnp.ndarray = None  # (V, 2); zeros = no texcoords

    @staticmethod
    def create(verts, faces, colors=None, uvs=None) -> "TriangleMesh":
        verts = _as_f32(verts)
        if colors is None:
            colors = jnp.ones_like(verts)
        if uvs is None:
            uvs = jnp.zeros((verts.shape[0], 2), jnp.float32)
        return TriangleMesh(verts=verts,
                            faces=jnp.asarray(faces, jnp.int32),
                            colors=_as_f32(colors), uvs=_as_f32(uvs))


@_pytree_dataclass
class Isosurface:
    """Isosurface(s) of the scene volume (reference: `ovr/scene.h:284-304`,
    `GeometryIsosurfaces`; rendered by the OSPRay backend's isosurface
    geometry)."""

    isovalues: jnp.ndarray  # (K,) in normalized sample units

    @staticmethod
    def create(isovalues) -> "Isosurface":
        iso = _as_f32(isovalues)
        if iso.ndim == 0:
            iso = iso[None]
        return Isosurface(isovalues=iso)


@_pytree_dataclass(static=("kind",))
class GeometryInstance:
    """A geometry + material placed by an affine transform
    (reference: `ovr::scene::Instance`, `ovr/scene.h:324-327`).

    `xfm` is a (3, 4) object-to-world affine [R | t]; rays are transformed
    world->object for intersection and normals object->world by R^-T.
    """

    geometry: Any  # TriangleMesh | Isosurface
    material: Material
    xfm: jnp.ndarray  # (3, 4)
    kind: str = "triangles"  # "triangles" | "isosurface"

    @staticmethod
    def create(geometry, material=None, xfm=None) -> "GeometryInstance":
        if material is None:
            material = Material.create()
        if xfm is None:
            xfm = jnp.concatenate(
                [jnp.eye(3, dtype=jnp.float32),
                 jnp.zeros((3, 1), jnp.float32)], axis=1)
        kind = ("isosurface" if isinstance(geometry, Isosurface)
                else "triangles")
        return GeometryInstance(geometry=geometry, material=material,
                                xfm=_as_f32(xfm), kind=kind)


@_pytree_dataclass(static=("kind",))
class Light:
    """A scene light (reference: `ovr::scene::Light`, `ovr/scene.h:329-350`:
    AMBIENT / DIRECTIONAL / POINT with intensity and color; the OSPRay
    backend additionally synthesizes sunSky lights,
    `ospray/device_impl.cpp:445-453`).

    The primary directional light drives the ray-marcher's shading with
    implicit intensity 2 (`shaders_raymarching.cu:137-138`); `ambient`
    feeds the path tracer's escape term (`params.h:79-80`). `direction`
    points *toward* the light; `position` is used by point lights.
    """

    direction: jnp.ndarray  # (3,) toward the light (directional/sunSky)
    color: jnp.ndarray  # (3,)
    ambient: jnp.ndarray  # () ambient intensity (kind == "ambient")
    position: jnp.ndarray  # (3,) point-light position
    intensity: jnp.ndarray  # ()
    kind: str = "directional"  # "directional" | "point" | "ambient" | "sunsky"

    @staticmethod
    def create(direction=(-907.108, 2205.875, -400.0267), color=(1.0, 1.0, 1.0),
               ambient=1.0, position=(0.0, 0.0, 0.0), intensity=1.0,
               kind: str = "directional") -> "Light":
        return Light(
            direction=_as_f32(direction), color=_as_f32(color),
            ambient=_as_f32(ambient), position=_as_f32(position),
            intensity=_as_f32(intensity), kind=kind,
        )


@_pytree_dataclass
class Scene:
    """A renderable scene: one structured (or neural) volume, its transfer
    function, lights and a default camera (reference: `ovr/scene.h:352-371`).

    `volume_sampling_rate` scales march density: step = 1 / rate in world
    units (`volume.cpp:172-179`).
    """

    volume: StructuredVolume
    tfn: TransferFunction
    light: Light  # primary directional light (drives ray-march shading)
    camera: Camera
    volume_sampling_rate: jnp.ndarray  # ()
    density_scale: jnp.ndarray  # () path-tracer extinction scale
    geometries: tuple = ()  # tuple[GeometryInstance, ...]
    lights: tuple = ()  # additional Lights (point/directional/ambient)
    # additional volume instances beyond `volume`
    # (tuple[VolumeInstance, ...]; the reference's OSPRay backend builds a
    # multi-instance world, ospray/device_impl.cpp:332-392)
    instances: tuple = ()

    @staticmethod
    def create(volume, tfn, light=None, camera=None, volume_sampling_rate=1.0,
               density_scale=1.0, geometries=(), lights=(),
               instances=()) -> "Scene":
        if light is None:
            light = Light.create()
        if camera is None:
            camera = Camera.create(from_=(0.0, 0.0, -2.0), at=(0.5, 0.5, 0.5))
        return Scene(
            volume=volume, tfn=tfn, light=light, camera=camera,
            volume_sampling_rate=_as_f32(volume_sampling_rate),
            density_scale=_as_f32(density_scale),
            geometries=tuple(geometries), lights=tuple(lights),
            instances=tuple(instances),
        )


@_pytree_dataclass
class VolumeInstance:
    """A structured volume + its transfer function placed in the world —
    one volumetric model instance (`ovr::scene::Model`/`Instance`,
    `ovr/scene.h:306-327`, affine volume placement
    `ovr/devices/optix7/volume.cpp:25-40`, TLAS `device_impl.cpp:575-610`).

    `xfm` is an optional (3, 4) object-to-world affine [R | t] applied on
    top of the volume's own world box (None = axis-aligned placement).
    Rays transform world->object for integration with the direction left
    unnormalized, so t values — and therefore step lengths and depth —
    stay in world units."""

    volume: StructuredVolume
    tfn: TransferFunction
    xfm: Any = None  # (3, 4) or None

    @staticmethod
    def create(volume, tfn, xfm=None) -> "VolumeInstance":
        if xfm is not None:
            xfm = _as_f32(xfm)
        return VolumeInstance(volume=volume, tfn=tfn, xfm=xfm)


def simple_scene(grid, color=None, alpha=None, value_range=None, **kw) -> Scene:
    """Convenience constructor used heavily by tests and examples."""
    volume = StructuredVolume.create(grid)
    if color is None:
        color = np.stack(
            [np.linspace(0, 1, 16), 0.5 * np.ones(16), np.linspace(1, 0, 16)], -1
        )
    if alpha is None:
        alpha = np.linspace(0.0, 1.0, 16)
    if value_range is None:
        value_range = np.asarray(volume.data_range)
    tfn = TransferFunction.create(color, alpha, value_range)
    return Scene.create(volume, tfn, **kw)


Pytree = Any
