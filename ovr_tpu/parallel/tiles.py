"""Image-tile-sharded rendering and distributed differentiable training.

Forward rendering is embarrassingly parallel over pixels, so the multi-chip
design shards image rows over the `tiles` mesh axis with `shard_map`
(no communication until the framebuffer is assembled); the backward pass
all-reduces parameter gradients (volume grid, TF tables) with `psum` —
XLA overlaps the reduction with the backward sweep.

This subsystem replaces nothing in the reference (it has no distribution,
SURVEY.md §2.6); it is the BASELINE.md multi-host target.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene
from ovr_tpu.render import integrator as ig
from ovr_tpu.render.camera import generate_rays, pixel_screen_coords
from ovr_tpu.parallel.mesh import BRICK_AXIS, TILE_AXIS


def _render_rows(scene: Scene, camera: Camera, cfg: api.RenderConfig,
                 screen_rows: jnp.ndarray) -> jnp.ndarray:
    """Render the rgba for a block of screen rows (rows, W, 2) -> (rows, W, 4)."""
    h, w = screen_rows.shape[:2]
    sc = screen_rows.reshape(-1, 2)
    org, direction = generate_rays(camera, sc, cfg.width, cfg.height)
    ctx = api._shade_ctx(scene, camera, cfg)
    leaves = (
        api._vol_repr(scene.volume), scene.tfn.color, scene.tfn.alpha,
        scene.tfn.value_range, cfg.base_rate * jnp.ones((), cfg.dtype),
    )
    mcfg = ig.MarchConfig(
        max_steps=cfg.max_steps, shading=cfg.shading,
        shadow_scale=cfg.shadow_scale,
        shadow_max_steps=cfg.shadow_max_steps or 1)
    step = jnp.asarray(1.0 / cfg.sampling_rate, cfg.dtype)
    color, grad, depth, alpha = ig.march(org, direction, leaves, ctx, mcfg,
                                         step)
    color, grad, depth, alpha = ig.finalize(color, grad, depth, alpha)
    rgba = jnp.concatenate([color, alpha[..., None]], -1)
    return rgba.reshape(h, w, 4)


def render_sharded(scene: Scene, cfg: api.RenderConfig, mesh: Mesh,
                   camera: Optional[Camera] = None,
                   light_grid=None) -> jnp.ndarray:
    """Render a full frame with image rows sharded over the tile axis.

    Returns (H, W, 4) with row-sharded layout (callers can `device_get` or
    keep it distributed). Requires cfg.height % n_tiles == 0. Routes to the
    shear-warp fast path when cfg carries a resolved plan (cfg.sw).
    """
    if camera is None:
        camera = scene.camera
    n_tiles = mesh.shape[TILE_AXIS]
    assert cfg.height % n_tiles == 0, "height must divide evenly over tiles"
    if cfg.sw is not None:
        return render_sharded_shearwarp(scene, cfg, mesh, camera,
                                        light_grid)
    screen = pixel_screen_coords(cfg.width, cfg.height, cfg.dtype)

    fn = shard_map(
        lambda s, c, rows: _render_rows(s, c, cfg, rows),
        mesh=mesh,
        in_specs=(P(), P(), P(TILE_AXIS)),
        out_specs=P(TILE_AXIS),
        check_vma=False,
    )
    return fn(scene, camera, screen)


def render_sharded_shearwarp(scene: Scene, cfg: api.RenderConfig,
                             mesh: Mesh, camera: Optional[Camera] = None,
                             light_grid=None) -> jnp.ndarray:
    """Shear-warp rendering with screen-row bands sharded over the tile
    axis. Each shard composites its own intermediate ray fan (shrunk to
    the band's footprint, so per-shard compute scales ~1/n_tiles) and
    warps it locally — no communication at all; the volume is replicated
    like the march tile mode."""
    from ovr_tpu.render import shearwarp as swr

    if camera is None:
        camera = scene.camera
    n_tiles = mesh.shape[TILE_AXIS]
    assert cfg.height % n_tiles == 0, "height must divide evenly over tiles"
    hb = cfg.height // n_tiles
    rnd8 = lambda x: max(8, int(-(-x // 8) * 8))
    sw_band = dataclasses.replace(
        cfg.sw, inter_h=rnd8(max(64, cfg.sw.inter_h // n_tiles)))
    cfg_band = dataclasses.replace(cfg, sw=sw_band)

    def body(s, c, lg):
        row0 = jax.lax.axis_index(TILE_AXIS) * hb
        color, grad, depth, alpha = swr.render_shearwarp(
            s, cfg_band, c, light_grid=lg, row0=row0, n_rows=hb)
        color, grad, depth, alpha = ig.finalize(color, grad, depth, alpha)
        rgba = jnp.concatenate([color, alpha[..., None]], -1)
        return rgba.reshape(hb, cfg.width, 4)

    lg = (light_grid if light_grid is not None
          else jnp.zeros((2, 2, 2), cfg.dtype))
    use_lg = light_grid is not None

    fn = shard_map(
        lambda s, c, g: body(s, c, g if use_lg else None),
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(TILE_AXIS),
        check_vma=False,
    )
    return fn(scene, camera, lg)


@dataclasses.dataclass(frozen=True)
class TrainState:
    """Optimizable scene parameters + SGD-with-momentum state."""

    grid: jnp.ndarray
    tf_color: jnp.ndarray
    tf_alpha: jnp.ndarray
    m_grid: jnp.ndarray
    m_color: jnp.ndarray
    m_alpha: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["grid", "tf_color", "tf_alpha", "m_grid", "m_color",
                 "m_alpha"],
    meta_fields=[],
)


def init_train_state(scene: Scene) -> TrainState:
    z = jnp.zeros_like
    return TrainState(
        grid=scene.volume.grid, tf_color=scene.tfn.color,
        tf_alpha=scene.tfn.alpha, m_grid=z(scene.volume.grid),
        m_color=z(scene.tfn.color), m_alpha=z(scene.tfn.alpha))


def _apply_params(scene: Scene, state: TrainState) -> Scene:
    volume = dataclasses.replace(scene.volume, grid=state.grid)
    tfn = dataclasses.replace(scene.tfn, color=state.tf_color,
                              alpha=state.tf_alpha)
    return dataclasses.replace(scene, volume=volume, tfn=tfn)


def make_train_step(cfg: api.RenderConfig, mesh: Mesh, lr: float = 1e-2,
                    momentum: float = 0.9):
    """Build a jitted distributed training step: render row-sharded, L2 loss
    vs a target image, `psum` parameter grads over the mesh, SGD update.

    Returns step(state, scene, camera, target) -> (state, loss). The target
    is row-sharded like the render; parameters are replicated.
    """

    n_tiles = mesh.shape[TILE_AXIS]
    hb = cfg.height // n_tiles
    if cfg.sw is not None:
        rnd8 = lambda x: max(8, int(-(-x // 8) * 8))
        sw_band = dataclasses.replace(
            cfg.sw, inter_h=rnd8(max(64, cfg.sw.inter_h // n_tiles)))
        cfg_band = dataclasses.replace(cfg, sw=sw_band)

    def local_loss(state, scene, camera, screen_rows, target_rows):
        s = _apply_params(scene, state)
        if cfg.sw is not None:
            # fast differentiable path: banded shear-warp through the
            # bounded-memory over-compositing adjoint (ops.adjoint)
            from ovr_tpu.render import shearwarp as swr
            row0 = jax.lax.axis_index(TILE_AXIS) * hb
            color, grad, depth, alpha = swr.render_shearwarp(
                s, cfg_band, camera, row0=row0, n_rows=hb)
            color, grad, depth, alpha = ig.finalize(color, grad, depth,
                                                    alpha)
            rgba = jnp.concatenate([color, alpha[..., None]], -1)
            rgba = rgba.reshape(hb, cfg.width, 4)
        else:
            rgba = _render_rows(s, camera, cfg, screen_rows)
        # mean over the *global* pixel count so loss matches unsharded math
        return jnp.sum((rgba - target_rows) ** 2) / (
            cfg.height * cfg.width * 4)

    def sharded_grads(state, scene, camera, screen, target):
        def body(state, scene, camera, screen_rows, target_rows):
            loss, grads = jax.value_and_grad(local_loss)(
                state, scene, camera, screen_rows, target_rows)
            # all-reduce: every device ends with the global gradient/loss
            grads = jax.lax.psum(grads, (TILE_AXIS, BRICK_AXIS))
            loss = jax.lax.psum(loss, (TILE_AXIS, BRICK_AXIS))
            return loss, grads

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(), P(TILE_AXIS), P(TILE_AXIS)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, scene, camera, screen, target)

    @jax.jit
    def step(state: TrainState, scene: Scene, camera: Camera,
             target: jnp.ndarray):
        screen = pixel_screen_coords(cfg.width, cfg.height, cfg.dtype)
        loss, grads = sharded_grads(state, scene, camera, screen, target)
        new_m_grid = momentum * state.m_grid + grads.grid
        new_m_color = momentum * state.m_color + grads.tf_color
        new_m_alpha = momentum * state.m_alpha + grads.tf_alpha
        return TrainState(
            grid=state.grid - lr * new_m_grid,
            tf_color=jnp.clip(state.tf_color - lr * new_m_color, 0.0, 1.0),
            tf_alpha=jnp.clip(state.tf_alpha - lr * new_m_alpha, 0.0, 1.0),
            m_grid=new_m_grid, m_color=new_m_color, m_alpha=new_m_alpha,
        ), loss

    return step
