"""Dense TPU path tracer: discrete-ordinates radiative transfer.

The reference's path-tracing pipeline
(`ovr/devices/optix7/shaders_pathtracing.cu:269-542`) delta-tracks each
ray to a collision, scatters isotropically (albedo = TF color), and
collects ambient light on escape after >= 1 scatter. Per-ray tracking is
gather-bound on TPU (~0.1 Mrays/s-class), so this module re-expresses the
*same transport equation* as dense lattice sweeps — the classic
discrete-ordinates (S_N) method, which maps onto the VPU/MXU:

  Let sigma(x) = alpha(x) * density_scale (the tracker's collision rate)
  and J(x) = expected radiance leaving a collision at x. The reference's
  estimator computes exactly

      J = albedo * ( ambient * E_esc  +  K J )                      (*)
      L(pixel) = integral of  sigma * T_cam * J  along the camera ray

  where E_esc(x) = mean_dir T(x -> boundary) and (K J)(x) =
  mean_dir integral of sigma * T * J along a ray from x. Both means are
  approximated by an M-direction quadrature (6 axial + 8 diagonal,
  equal-weighted); each directional term is computed for EVERY lattice
  point at once by a plane-by-plane shear sweep whose constant fractional
  lateral shift is two small matmuls — no gathers — and (*) is solved by
  source iteration with the reference's collision budget
  (max_scatters / 2 levels).

The camera gather L reuses the shear-warp fast path: `render_shearwarp`
accepts `pt_fields=(sigma, J)` and composites the emission-absorption
integral with per-plane opacity 1 - exp(-sigma dt) and emission J (the
same fan + two-pass warp; XLA slice scan, differentiable via over_scan).

Bias vs the Monte-Carlo tracker: lattice discretization, the M-direction
quadrature, and per-cell self-emission — all vanish with resolution/M and
are validated distributionally against `render.pathtracer` in
tests/test_pathtracer.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu.core.sampling import classify

# 14-direction quadrature: 6 axial + 8 diagonals, equal weights (keeps
# the quadrature mean isotropic; within the method's lattice bias).
_AX = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
_DIAG = [np.array((sx, sy, sz)) / np.sqrt(3.0)
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
DIRECTIONS = np.array(_AX + _DIAG, np.float64)


@dataclasses.dataclass(frozen=True)
class PTDenseConfig:
    levels: int = 12        # source-iteration depth = collision budget
    n_dirs: int = 14        # 6 axial (+ 8 diagonal when 14)


def build_lattices(leaves, res: tuple[int, int, int]):
    """sigma (D,H,W) = classified alpha * density_scale and albedo
    (D,H,W,3) = TF color at lattice cell centers (the delta tracker's
    acceptance rate and throughput factor, shaders_pathtracing.cu:
    330-334, 520)."""
    from ovr_tpu.neural.field import sample_any_volume

    grid, color_table, alpha_table, value_range, density_scale = leaves
    d, h, w = res
    zs = (jnp.arange(d) + 0.5) / d
    ys = (jnp.arange(h) + 0.5) / h
    xs = (jnp.arange(w) + 0.5) / w
    pz, py, px = jnp.meshgrid(zs, ys, xs, indexing="ij")
    p = jnp.stack([px, py, pz], -1).reshape(-1, 3)
    s = sample_any_volume(grid, p)
    rgb, a = classify(color_table, alpha_table, value_range, s)
    sigma = (a * density_scale).reshape(d, h, w)
    albedo = rgb.reshape(d, h, w, 3)
    return sigma, albedo


def _shift_matrix(n: int, delta: float, dtype) -> jnp.ndarray:
    """(n, n) resample matrix: row i holds the hat weights of source
    position i + delta, ZERO outside [0, n-1] (out-of-lattice = vacuum)."""
    pos = jnp.arange(n, dtype=dtype) + jnp.asarray(delta, dtype)
    idx = jnp.arange(n, dtype=dtype)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - idx))


def sweep_direction(sigma, emis, direction, spacing,
                    include_emis: bool = True):
    """One directional sweep: for every lattice point, marching along
    `direction` (unit, world axes x/y/z) with per-plane opacity
    a = 1 - exp(-sigma ds),

      T(x) = prod_k (1 - a_k)                      escape transmittance
      R(x) = sum_k a_k E_k prod_{j<k} (1 - a_j)    in-scattered gather

    Planes perpendicular to the principal axis are processed far-to-near;
    each reads the next plane's running (T, R) at a constant fractional
    lateral offset (two shift matmuls). Returns (T (D,H,W),
    R (D,H,W,3) | None). `spacing` = world units per voxel, (x, y, z).
    """
    d3 = np.asarray(direction, np.float64)
    axis = int(np.argmax(np.abs(d3)))
    sgn = 1 if d3[axis] >= 0 else -1
    gdim = 2 - axis  # grid dims are (z, y, x)
    sig = jnp.moveaxis(sigma, gdim, 0)
    em = jnp.moveaxis(emis, gdim, 0) if include_emis else None
    if sgn < 0:  # traversal order: +dim0 = +direction
        sig = sig[::-1]
        em = em[::-1] if include_emis else None
    n_a, n1, n2 = sig.shape
    rem = [g for g in (0, 1, 2) if g != gdim]
    lat_world = [2 - g for g in rem]  # world axes of dims 1, 2
    # spacing may be traced (jit); axis/sign choices are static (numpy d3)
    ds = spacing[axis] / abs(d3[axis])
    dt = sig.dtype
    w1 = _shift_matrix(n1, d3[lat_world[0]] * ds / spacing[lat_world[0]],
                       dt)
    w2 = _shift_matrix(n2, d3[lat_world[1]] * ds / spacing[lat_world[1]],
                       dt)
    # weight mass lost off-lattice escapes with T = 1
    esc_miss = 1.0 - w1.sum(1)[:, None] * w2.sum(1)[None, :]

    def shift2(plane):
        return w1 @ plane @ w2.T

    def shift3(field):
        out = jnp.einsum("ij,jkc->ikc", w1, field)
        return jnp.einsum("lk,ikc->ilc", w2, out)

    a = 1.0 - jnp.exp(-sig * ds)

    def body(carry, k):
        t_next, r_next = carry
        t_sh = shift2(t_next) + esc_miss
        ak = a[k]
        t_k = (1.0 - ak) * t_sh
        if include_emis:
            r_k = (ak[..., None] * em[k]
                   + (1.0 - ak)[..., None] * shift3(r_next))
        else:
            r_k = r_next
        return (t_k, r_k), (t_k, r_k)

    t0 = jnp.ones((n1, n2), dt)
    r0 = (jnp.zeros((n1, n2, 3), dt) if include_emis
          else jnp.zeros((1,), dt))
    _, (ts, rs) = jax.lax.scan(body, (t0, r0),
                               jnp.arange(n_a - 1, -1, -1))
    # scan emitted planes n_a-1..0; ascending = reverse; undo the sgn<0
    # flip by reversing again — the two cancel when sgn < 0.
    t_field = jnp.moveaxis(ts if sgn < 0 else ts[::-1], 0, gdim)
    if include_emis:
        r_field = jnp.moveaxis(rs if sgn < 0 else rs[::-1], 0, gdim)
    else:
        r_field = None
    return t_field, r_field


def solve_scatter(sigma, albedo, ambient, spacing, cfg: PTDenseConfig):
    """Source iteration for J = albedo * (ambient * E_esc + K J).
    Returns J (D,H,W,3)."""
    dirs = DIRECTIONS[:cfg.n_dirs]
    wq = 1.0 / len(dirs)

    e_esc = jnp.zeros(sigma.shape, sigma.dtype)
    for d3 in dirs:
        t_f, _ = sweep_direction(sigma, None, d3, spacing,
                                 include_emis=False)
        e_esc = e_esc + wq * t_f

    j0 = albedo * (ambient * e_esc)[..., None]
    j = j0
    for _ in range(cfg.levels - 1):
        kj = jnp.zeros_like(j)
        for d3 in dirs:
            _, r_f = sweep_direction(sigma, j, d3, spacing)
            kj = kj + wq * r_f
        j = j0 + albedo * kj
    return j


def prepare(scene, cfg):
    """Build (sigma, J) for the scene — camera-independent; rebuild when
    the volume, TF, density scale, or ambient changes."""
    from ovr_tpu.api import _vol_repr

    vol = scene.volume
    leaves = (_vol_repr(vol), scene.tfn.color, scene.tfn.alpha,
              scene.tfn.value_range, scene.density_scale)
    shape = vol.grid.shape if hasattr(vol, "grid") else (128, 128, 128)
    res = tuple(min(int(s), cfg.pt_lattice) for s in shape)
    sigma, albedo = build_lattices(leaves, res)
    ext = vol.world_hi - vol.world_lo
    spacing = jnp.stack([ext[i] / res[2 - i] for i in (0, 1, 2)])
    ptc = PTDenseConfig(levels=max(cfg.max_scatters // 2, 1),
                        n_dirs=cfg.pt_dirs)
    j = solve_scatter(sigma, albedo, scene.light.ambient, spacing, ptc)
    return sigma, j


def render_frame_dense(scene, cfg, camera, pt_fields=None):
    """Render the path-traced image densely: solve (or reuse) the
    scatter lattices, then composite L = integral sigma T J through the
    shear-warp fan (cfg.sw must be resolved with pt eligibility)."""
    from ovr_tpu.api import Frame
    from ovr_tpu.render import integrator as ig
    from ovr_tpu.render.shearwarp import render_shearwarp

    if pt_fields is None:
        pt_fields = prepare(scene, cfg)
    color, grad, depth, alpha = render_shearwarp(
        scene, cfg, camera, pt_fields=pt_fields)
    color, grad, depth, alpha = ig.finalize(color, grad, depth, alpha)
    # reference CH sets alpha = 1 on any box hit (:541): alpha from the
    # fan composite is the box-coverage footprint after the warp, but the
    # tracker's alpha is binary; keep the composite (anti-aliased edge).
    rgba = jnp.concatenate([color, alpha[..., None]], -1)
    return Frame(rgba=rgba.reshape(cfg.height, cfg.width, 4),
                 grad=grad.reshape(cfg.height, cfg.width, 3),
                 depth=depth.reshape(cfg.height, cfg.width))
