"""Precomputed light-transmittance grid for O(1) per-sample shadows.

The reference shoots a full shadow ray per march sample
(`ovr/devices/optix7/shaders_raymarching.cu:139-159`): each sample marches
toward the light at 10x the base step until it leaves the volume. Per-thread
early exit makes that tolerable on a SIMT GPU; in lockstep TPU execution the
whole batch pays the worst-case shadow march on every step — O(max_steps x
shadow_max_steps) volume samples per ray.

TPU-native restructuring: because the shadow term depends only on (volume,
transfer function, light direction) — not on the camera ray — precompute the
accumulated shadow alpha toward the light once per commit on a coarse lattice
over the volume's object space (each lattice point runs the reference's exact
shadow march, vectorized over all points in one scan), then the integrator
replaces the per-sample shadow march with one trilinear fetch. Cost moves
from per-frame O(W*H*steps*shadow_steps) to per-commit O(res^3*shadow_steps)
— amortized over every frame, spp, and camera move. The approximation error
is the trilinear reconstruction between lattice points; shadows are
low-frequency, and `res=volume_dims/2` is visually indistinguishable
(parity-tested against the exact march in tests/test_render.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def build_light_grid(scene_leaves, light_dir, world_lo, world_hi, step,
                     cfg, res: tuple[int, int, int]) -> jnp.ndarray:
    """Shadow-alpha lattice (res_z, res_y, res_x) over object space [0,1]^3.

    Each lattice texel center (CUDA half-texel convention, so trilinear
    fetches through `core.sampling.sample_volume` reconstruct exactly at the
    centers) stores the alpha accumulated marching from that world position
    toward `light_dir` — the quantity `raymarching_shadow` returns
    (`shaders_raymarching.cu:44-85`). `scene_leaves`, `step`, `cfg` as in
    `integrator.march`. Differentiable (pure scan over jnp ops).
    """
    from ovr_tpu.render import integrator as ig

    rz, ry, rx = res
    dt = jnp.asarray(world_lo).dtype
    # texel centers in object space
    xs = (jnp.arange(rx, dtype=dt) + 0.5) / rx
    ys = (jnp.arange(ry, dtype=dt) + 0.5) / ry
    zs = (jnp.arange(rz, dtype=dt) + 0.5) / rz
    pz, py, px = jnp.meshgrid(zs, ys, xs, indexing="ij")
    p_obj = jnp.stack([px, py, pz], axis=-1).reshape(-1, 3)
    pos = world_lo + p_obj * (world_hi - world_lo)

    (grid, color_table, alpha_table, value_range, base) = scene_leaves
    alpha = ig._shadow_alpha(grid, color_table, alpha_table, value_range,
                             base, pos, light_dir, world_lo, world_hi, step,
                             cfg)
    return alpha.reshape(rz, ry, rx)


def default_resolution(vol_shape, cap: int = 128) -> tuple[int, int, int]:
    """Volume resolution per axis, clamped to [8, cap] (shadows are smooth;
    a 128^3 lattice reconstructs a 256^3 volume's shadow term to ~1e-2)."""
    return tuple(int(min(max(d, 8), cap)) for d in vol_shape)
