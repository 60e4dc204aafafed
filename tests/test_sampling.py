"""Unit tests for the differentiable sampling core."""

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu.core import sampling


def numpy_trilinear(grid, p):
    """Independent NumPy oracle of CUDA tex3D clamp+linear semantics."""
    Z, Y, X = grid.shape
    dims = np.array([X, Y, Z], np.float64)
    p = np.clip(np.asarray(p, np.float64), 0, 1)
    c = np.clip(p * dims - 0.5, 0, dims - 1)
    i0 = np.floor(c).astype(int)
    f = c - i0
    i1 = np.minimum(i0 + 1, (dims - 1).astype(int))
    out = np.zeros(p.shape[:-1])
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ix = np.where(dx, i1[..., 0], i0[..., 0])
                iy = np.where(dy, i1[..., 1], i0[..., 1])
                iz = np.where(dz, i1[..., 2], i0[..., 2])
                w = (
                    (f[..., 0] if dx else 1 - f[..., 0])
                    * (f[..., 1] if dy else 1 - f[..., 1])
                    * (f[..., 2] if dz else 1 - f[..., 2])
                )
                out += w * grid[iz, iy, ix]
    return out


def test_trilinear_matches_numpy(small_grid, rng):
    p = rng.uniform(-0.1, 1.1, size=(500, 3)).astype(np.float32)
    got = sampling.sample_volume(jnp.asarray(small_grid), jnp.asarray(p))
    want = numpy_trilinear(small_grid, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)


def test_trilinear_exact_at_voxel_centers(small_grid):
    Z, Y, X = small_grid.shape
    idx = np.stack(np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                               indexing="ij"), -1).reshape(-1, 3)
    p = (idx + 0.5) / np.array([X, Y, Z])
    got = sampling.sample_volume(jnp.asarray(small_grid),
                                 jnp.asarray(p, jnp.float32))
    want = small_grid[idx[:, 2], idx[:, 1], idx[:, 0]]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_table_lookup_nodal():
    table = jnp.asarray(np.array([0.0, 1.0, 0.5, 0.25], np.float32))
    # v*(N-1) = 0, 1.5, 3 -> 0.0, mid(1.0,0.5)=0.75, 0.25
    v = jnp.asarray([0.0, 0.5, 1.0])
    got = sampling.sample_table_1d(table, v)
    np.testing.assert_allclose(np.asarray(got), [0.0, 0.75, 0.25], atol=1e-6)


def test_table_lookup_rgb():
    table = jnp.asarray(np.stack([np.linspace(0, 1, 8)] * 3, -1), jnp.float32)
    v = jnp.asarray([0.0, 0.3, 1.0])
    got = sampling.sample_table_1d(table, v)
    np.testing.assert_allclose(np.asarray(got)[:, 0], [0.0, 0.3, 1.0], atol=1e-6)


def test_classify_value_range():
    color = jnp.asarray(np.stack([np.linspace(0, 1, 4)] * 3, -1), jnp.float32)
    alpha = jnp.asarray(np.linspace(0, 1, 4), jnp.float32)
    vr = jnp.asarray([2.0, 4.0])
    rgb, a = sampling.classify(color, alpha, vr, jnp.asarray([1.0, 3.0, 5.0]))
    np.testing.assert_allclose(np.asarray(a), [0.0, 0.5, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb)[:, 1], [0.0, 0.5, 1.0], atol=1e-6)


def test_opacity_correction_identity_and_power():
    a = jnp.asarray([0.0, 0.25, 0.5, 0.9999])
    # base*step == 1 -> identity
    got = sampling.opacity_correction(a, 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a), atol=1e-5)
    # base*step == 2 -> 1-(1-a)^2
    got = sampling.opacity_correction(a, 2.0, 1.0)
    np.testing.assert_allclose(
        np.asarray(got), 1 - (1 - np.asarray(a)) ** 2, atol=1e-5)


def test_opacity_correction_grad_finite_at_one():
    g = jax.grad(lambda a: sampling.opacity_correction(a, 1.0, 0.5))(1.0)
    assert np.isfinite(g)


def test_intersect_box():
    org = jnp.asarray([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0], [0.5, 0.5, 0.5]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    t0 = jnp.zeros(3)
    t1 = jnp.full((3,), 1e30)
    a, b = sampling.intersect_box(org, d, lo, hi, t0, t1)
    a, b = np.asarray(a), np.asarray(b)
    # hits front face at t=1, exits at t=2
    np.testing.assert_allclose([a[0], b[0]], [1.0, 2.0], atol=1e-6)
    # parallel ray outside the box misses
    assert b[1] <= a[1]
    # ray starting inside: t0 clamped at 0, exits at 0.5
    np.testing.assert_allclose([a[2], b[2]], [0.0, 0.5], atol=1e-6)


def test_volume_gradient_linear_field():
    # grid = x + 2y + 3z (in normalized coords) -> constant gradient
    n = 16
    z, y, x = np.meshgrid(*( [(np.arange(n) + 0.5) / n] * 3 ), indexing="ij")
    grid = jnp.asarray((x + 2 * y + 3 * z).astype(np.float32))
    p = jnp.asarray([[0.4, 0.5, 0.6], [0.2, 0.3, 0.4]], jnp.float32)
    v = sampling.sample_volume(grid, p)
    g = sampling.volume_gradient(grid, p, v)
    np.testing.assert_allclose(np.asarray(g), [[1, 2, 3]] * 2, rtol=1e-4)
