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

import jax
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


def build_light_grid_swept(scene_leaves, light_dir, world_lo, world_hi,
                           cfg, res: tuple[int, int, int]) -> jnp.ndarray:
    """Dense (gather-free) shadow-alpha lattice: a light-axis sweep.

    The lattice's transmittance satisfies a plane-to-plane recurrence along
    the light's dominant axis: T(plane k) = shift(T(plane k+1 toward the
    light)) * (1 - a(midpoint sample)), where the shift is the constant
    lateral offset the light direction advances per plane — a dense 2D
    resample (interp matmuls), like the shear-warp slice loop. Replaces the
    per-lattice-point shadow march (res^3 x shadow_steps *gathers*) with
    res_a dense plane ops; same optical-depth integral, finer quadrature
    (one sample per plane instead of the reference's 10x-coarse shadow
    step, `shaders_raymarching.cu:44-85`).

    `light_dir` must be concrete (the sweep axis is static); jit-traced
    directions fall back to `build_light_grid`.
    """
    import numpy as np

    (grid, color_table, alpha_table, value_range, base) = scene_leaves
    if not hasattr(grid, "shape") or grid.ndim != 3:
        # neural fields have no dense planes; use the sampling builder
        return build_light_grid(scene_leaves, light_dir, world_lo, world_hi,
                                jnp.asarray(0.01), cfg, res)
    ld = np.asarray(light_dir, np.float64)
    ld = ld / max(np.linalg.norm(ld), 1e-30)
    axis = int(np.argmax(np.abs(ld)))
    sgn = 1 if ld[axis] >= 0 else -1
    perp = [w for w in (0, 1, 2) if w != axis]
    w1, w2 = perp

    dt = jnp.asarray(world_lo).dtype
    ext = jnp.asarray(world_hi) - jnp.asarray(world_lo)
    res_xyz = (res[2], res[1], res[0])  # res is (rz, ry, rx)
    n_a = res_xyz[axis]
    n_c = res_xyz[w1]  # lattice cols (minor)
    n_r = res_xyz[w2]  # lattice rows
    # volume viewed with the light axis first, flipped so index 0 is the
    # light-side face (the sweep start)
    gv = jnp.transpose(grid, (2 - axis, 2 - w2, 2 - w1))
    if sgn > 0:
        gv = gv[::-1]
    vz, vr, vc = gv.shape

    # lattice texel centers (object space) along each axis
    qa = (jnp.arange(n_a, dtype=dt) + 0.5) / n_a  # distance from light face
    qc = (jnp.arange(n_c, dtype=dt) + 0.5) / n_c
    qr = (jnp.arange(n_r, dtype=dt) + 0.5) / n_r
    # lateral drift of the shadow ray per unit object-a, in object units
    ext_np = np.asarray(ext, np.float64)
    drift1 = float(ld[w1] / ld[axis] * ext_np[axis] / ext_np[w1]) * (-sgn)
    drift2 = float(ld[w2] / ld[axis] * ext_np[axis] / ext_np[w2]) * (-sgn)
    # (toward the light = decreasing sweep index; drift folded accordingly)
    dq = 1.0 / n_a
    step_world = float(ext_np[axis]) * dq / max(abs(float(ld[axis])), 1e-12)

    i_c = jnp.arange(n_c, dtype=dt)[None, :]
    i_r = jnp.arange(n_r, dtype=dt)[None, :]

    def interp_open(pos, n, idx_row):
        """Interp matrix with *zero* weight outside [0, n-1] (open
        boundary: outside the box the shadow ray sees T = 1)."""
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - idx_row))
        return w

    def shift_T(t, s1, s2):
        """Resample T at lattice positions shifted by (s1, s2) object
        units; out-of-box reads contribute transmittance 1."""
        pc = (qc + s1) * n_c - 0.5
        pr = (qr + s2) * n_r - 0.5
        wc = interp_open(pc, n_c, i_c)  # (n_c, n_c)
        wr = interp_open(pr, n_r, i_r)  # (n_r, n_r)
        out = wr @ t @ wc.T
        cover = (wr @ jnp.ones((n_r, n_c), dt)) @ wc.T
        return out + (1.0 - cover)

    def sample_plane(qa_mid, s1, s2):
        """Volume sample on the plane at object-a distance qa_mid from the
        light face, at lattice perp positions shifted by (s1, s2)."""
        cz = jnp.clip(qa_mid * vz - 0.5, 0.0, vz - 1.0)
        k0 = jnp.clip(jnp.floor(cz).astype(jnp.int32), 0, max(vz - 2, 0))
        fzz = cz - k0.astype(dt)
        sl = jax.lax.dynamic_slice(gv, (k0, 0, 0), (min(2, vz), vr, vc))
        # native-int volumes (u8/u16 residency) classify against the
        # normalized TF value_range: apply the normalized-integer storage
        # scale here exactly like every other direct plane reader
        # (shearwarp._plane_fields, swslice S_GS, accel ranges)
        plane = (sl[0].astype(dt) * (1.0 - fzz)
                 + sl[-1].astype(dt) * fzz) * storage_scale(grid.dtype)
        pc = jnp.clip((qc + s1) * vc - 0.5, 0.0, vc - 1.0)
        pr = jnp.clip((qr + s2) * vr - 0.5, 0.0, vr - 1.0)
        wc = jnp.maximum(0.0, 1.0 - jnp.abs(
            pc[:, None] - jnp.arange(vc, dtype=dt)[None, :]))
        wr = jnp.maximum(0.0, 1.0 - jnp.abs(
            pr[:, None] - jnp.arange(vr, dtype=dt)[None, :]))
        return wr @ plane @ wc.T  # (n_r, n_c)

    from ovr_tpu.core.sampling import (classify, opacity_correction,
                                       storage_scale)

    def body(t_prev, k):
        # plane k (sweep index, 0 = light face); its shadow segment goes
        # from plane k to plane k-1 (toward the light): midpoint at
        # qa_mid = qa[k] - dq/2, laterally advanced by half a drift step
        qa_k = (k.astype(dt) + 0.5) * dq
        s1m = drift1 * (-0.5 * dq)
        s2m = drift2 * (-0.5 * dq)
        smp = sample_plane(qa_k - 0.5 * dq, s1m, s2m)
        _, a = classify(color_table, alpha_table, value_range, smp)
        a = opacity_correction(a, base, jnp.asarray(step_world, dt))
        t_here = shift_T(t_prev, drift1 * (-dq), drift2 * (-dq)) * (1.0 - a)
        return t_here, 1.0 - t_here  # accumulate alpha = 1 - T

    t0 = jnp.ones((n_r, n_c), dt)
    _, alphas = jax.lax.scan(body, t0, jnp.arange(n_a))
    # alphas[k] is the lattice plane at sweep index k (light face first);
    # undo the view transform: sweep axis back to its world order
    lat = alphas  # (n_a, n_r, n_c)
    if sgn > 0:
        lat = lat[::-1]
    # current dims order: (axis, w2, w1) -> back to (z, y, x)
    inv = np.argsort([2 - axis, 2 - w2, 2 - w1])
    return jnp.transpose(lat, tuple(inv))


def default_resolution(vol_shape, cap: int = 128) -> tuple[int, int, int]:
    """Volume resolution per axis, clamped to [8, cap] (shadows are smooth;
    a 128^3 lattice reconstructs a 256^3 volume's shadow term to ~1e-2)."""
    return tuple(int(min(max(d, 8), cap)) for d in vol_shape)
