"""Camera basis + ray generation.

Reproduces the reference's camera math:
- basis construction (`ovr/devices/optix7/device_impl.cpp:125-144`):
  direction = normalize(at - from); horizontal = 2*tan(fovy/2)*aspect*
  normalize(cross(direction, up)); vertical = cross(horizontal, direction)/aspect
- per-pixel ray (`shaders_raymarching.cu:360-362`):
  dir = normalize(direction + (sx-0.5)*horizontal + (sy-0.5)*vertical)
- screen projection / optical flow (`shaders_common.h:291-309`).

Orthographic cameras (supported by the reference's OSPRay backend via
`camera.orthographic.height`, `ovr/devices/ospray/device_impl.cpp:540-579`)
keep the same basis but offset the origin in the image plane and use the
shared direction.

All functions are differentiable w.r.t. the camera pytree.
"""

from __future__ import annotations

import jax.numpy as jnp

from ovr_tpu.core.scene import Camera, ORTHOGRAPHIC
from ovr_tpu.core.sampling import safe_normalize


def camera_basis(camera: Camera, width: int, height: int):
    """Returns (position (3,), direction (3,), horizontal (3,), vertical (3,))."""
    aspect = width / float(height)
    direction = safe_normalize(camera.at - camera.from_)
    if camera.kind == ORTHOGRAPHIC:
        t = camera.height
    else:
        t = 2.0 * jnp.tan(jnp.deg2rad(camera.fovy) * 0.5)
    horizontal = t * aspect * safe_normalize(jnp.cross(direction, camera.up))
    vertical = jnp.cross(horizontal, direction) / aspect
    return camera.from_, direction, horizontal, vertical


def pixel_screen_coords(width: int, height: int, dtype=jnp.float32):
    """Normalized screen coords at pixel centers; shape (H, W, 2) in [0,1]²."""
    xs = (jnp.arange(width, dtype=dtype) + 0.5) / width
    ys = (jnp.arange(height, dtype=dtype) + 0.5) / height
    sx, sy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([sx, sy], axis=-1)


def generate_rays(camera: Camera, screen: jnp.ndarray, width: int, height: int):
    """Rays for normalized screen positions `screen` (..., 2).

    Returns (org (...,3), dir (...,3)); dir is normalized for perspective.
    """
    position, direction, horizontal, vertical = camera_basis(camera, width, height)
    du = screen[..., 0:1] - 0.5
    dv = screen[..., 1:2] - 0.5
    if camera.kind == ORTHOGRAPHIC:
        org = position + du * horizontal + dv * vertical
        d = jnp.broadcast_to(direction, org.shape)
        return org, d
    d = safe_normalize(direction + du * horizontal + dv * vertical)
    org = jnp.broadcast_to(position, d.shape)
    return org, d


def world_to_camera_normal(camera: Camera, width: int, height: int,
                           n_world: jnp.ndarray) -> jnp.ndarray:
    """Rotate a world-space normal into camera space.

    The camera frame is (x̂=normalize(horizontal), ŷ=normalize(vertical),
    ẑ=-direction); reference `get_xfm_world_to_camera`
    (`shaders_common.h:276-289`).
    """
    _, direction, horizontal, vertical = camera_basis(camera, width, height)
    x = safe_normalize(horizontal)
    y = safe_normalize(vertical)
    z = -direction
    return jnp.stack(
        [
            jnp.sum(n_world * x, axis=-1),
            jnp.sum(n_world * y, axis=-1),
            jnp.sum(n_world * z, axis=-1),
        ],
        axis=-1,
    )


def project_to_screen(camera: Camera, width: int, height: int,
                      p: jnp.ndarray) -> jnp.ndarray:
    """Project world point(s) onto the normalized screen plane (+0.5 center).

    Reference: `project_to_screen` (`shaders_common.h:291-301`).
    """
    position, _, horizontal, vertical = camera_basis(camera, width, height)
    w = p - position
    r2 = jnp.sum(horizontal * horizontal)
    t2 = jnp.sum(vertical * vertical)
    sx = jnp.sum(w * horizontal, axis=-1) / r2
    sy = jnp.sum(w * vertical, axis=-1) / t2
    return jnp.stack([sx, sy], axis=-1) + 0.5


def optical_flow(camera: Camera, last_camera: Camera, width: int, height: int,
                 p: jnp.ndarray) -> jnp.ndarray:
    """Screen-space motion of point p between two camera poses
    (`shaders_common.h:303-309`)."""
    return (project_to_screen(camera, width, height, p)
            - project_to_screen(last_camera, width, height, p))


def blended_flow(camera: Camera, last_camera: Camera, width: int, height: int,
                 org: jnp.ndarray, direction: jnp.ndarray,
                 depth_premult: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Exact alpha-blended optical flow from the march's premultiplied depth.

    The reference blends per-sample flow front-to-back like color
    (`shaders_raymarching.cu:125-131,163`). Since `project_to_screen` is
    affine in p (p -> M p + c, no perspective divide), the blended sum
    sum_i w_i flow(p_i) equals flow_lin(sum_i w_i p_i) + (sum_i w_i) *
    flow(0), and sum w_i p_i = org * alpha + dir * sum w_i t_i — so one extra
    scalar march channel (premultiplied depth) reconstructs the whole flow
    buffer. Returns the straight (alpha-divided) flow.
    """
    p_sum = org * alpha[..., None] + direction * depth_premult[..., None]
    f_p = optical_flow(camera, last_camera, width, height, p_sum)
    f_0 = optical_flow(camera, last_camera, width, height,
                       jnp.zeros_like(org))
    f_premult = f_p + (alpha[..., None] - 1.0) * f_0
    safe = jnp.maximum(alpha, 1e-20)[..., None]
    return jnp.where(alpha[..., None] > 0, f_premult / safe, 0.0)
