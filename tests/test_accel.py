"""Macrocell partition tests: exact value ranges, conservative majorants,
and empty-space skipping equivalence."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, Scene, StructuredVolume, TransferFunction
from ovr_tpu.core.sampling import classify, sample_volume
from ovr_tpu.render import accel


def _brute_ranges(grid):
    """Brute-force per-cell (lo, hi) over the 18-voxel halo window."""
    Z, Y, X = grid.shape
    M = accel.MACROCELL_SIZE
    mz, my, mx = (-(-d // M) for d in (Z, Y, X))
    lo = np.full((mz, my, mx), np.inf)
    hi = np.full((mz, my, mx), -np.inf)
    for cz in range(mz):
        for cy in range(my):
            for cx in range(mx):
                z0, z1 = max(cz * M - 1, 0), min(cz * M + M + 1, Z)
                y0, y1 = max(cy * M - 1, 0), min(cy * M + M + 1, Y)
                x0, x1 = max(cx * M - 1, 0), min(cx * M + M + 1, X)
                blk = grid[z0:z1, y0:y1, x0:x1]
                lo[cz, cy, cx] = blk.min()
                hi[cz, cy, cx] = blk.max()
    return lo, hi


def test_value_ranges_exact(rng):
    grid = rng.uniform(size=(40, 33, 17)).astype(np.float32)
    lo, hi = accel.compute_value_ranges(jnp.asarray(grid))
    blo, bhi = _brute_ranges(grid)
    np.testing.assert_allclose(np.asarray(lo), blo, atol=1e-7)
    np.testing.assert_allclose(np.asarray(hi), bhi, atol=1e-7)


def test_majorants_match_brute_force(rng):
    n = 37
    alpha = rng.uniform(size=n).astype(np.float32)
    vlo = rng.uniform(0.0, 0.5, size=(4, 4, 4)).astype(np.float32)
    vhi = vlo + rng.uniform(0.0, 0.5, size=(4, 4, 4)).astype(np.float32)
    vr = jnp.asarray([0.1, 0.9], jnp.float32)
    got = np.asarray(accel.compute_majorants(
        jnp.asarray(vlo), jnp.asarray(vhi), jnp.asarray(alpha), vr))

    # brute force per reference majorant_kernel (sp_singlemc.cu:79-95)
    def brute(lo, hi):
        lo = (np.clip(lo, 0.1, 0.9) - 0.1) / 0.8
        hi = (np.clip(hi, 0.1, 0.9) - 0.1) / 0.8
        i0 = int(np.clip(np.floor(lo * (n - 1) + 0.5) - 1, 0, n - 1))
        i1 = int(np.clip(np.floor(hi * (n - 1) + 0.5) + 1, 0, n - 1))
        return alpha[i0:i1 + 1].max()

    want = np.vectorize(brute)(vlo, vhi)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_majorant_bounds_true_opacity(rng, small_grid):
    """Majorant must upper-bound TF opacity at any point inside the cell."""
    grid = jnp.asarray(small_grid)
    alpha = jnp.asarray(rng.uniform(size=32).astype(np.float32))
    color = jnp.zeros((32, 3), jnp.float32)
    vr = jnp.asarray([0.0, 1.0], jnp.float32)
    mc = accel.build_macrocells(grid, alpha, vr)
    p = jnp.asarray(rng.uniform(size=(2000, 3)).astype(np.float32))
    s = sample_volume(grid, p)
    _, a = classify(color, alpha, vr, s)
    maj = mc.majorant_at(p)
    assert np.all(np.asarray(a) <= np.asarray(maj) + 1e-6)


def test_empty_space_skip_matches_dense(rng):
    """A volume with large empty regions renders identically with skipping."""
    grid = np.zeros((48, 48, 48), np.float32)
    grid[20:28, 20:28, 20:28] = rng.uniform(0.5, 1.0, size=(8, 8, 8))
    volume = StructuredVolume.create(grid)
    alpha = np.concatenate([np.zeros(8), np.linspace(0, 0.8, 8)]).astype(
        np.float32)
    color = np.stack([np.linspace(0, 1, 16)] * 3, -1).astype(np.float32)
    tfn = TransferFunction.create(color, alpha, (0.0, 1.0))
    cam = Camera.create(from_=(0.5, 0.5, -2.0), at=(0.5, 0.5, 0.5),
                        kind="orthographic", height=1.2)
    scene = Scene.create(volume, tfn, camera=cam, volume_sampling_rate=48.0)

    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=48.0,
                           shading="none").resolved(scene)
    dense = np.asarray(api.render(scene, cfg).rgba)

    mc = accel.build_macrocells(scene.volume.grid, scene.tfn.alpha,
                                scene.tfn.value_range)
    cfg2 = dataclasses.replace(cfg, use_macrocells=True)
    skipped = np.asarray(api.render(scene, cfg2, macrocells=mc).rgba)
    np.testing.assert_allclose(skipped, dense, atol=5e-4)


def test_cell_exit_t():
    grid = jnp.zeros((32, 32, 32), jnp.float32)
    mc = accel.build_macrocells(grid, jnp.zeros(4), jnp.asarray([0.0, 1.0]))
    org = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([0.0], jnp.float32)
    # cells are 16/32 = 0.5 wide; from z=0.1 along +z exit at z=0.5
    t_exit = mc.cell_exit_t(org, d, t, jnp.zeros(3), jnp.ones(3))
    np.testing.assert_allclose(np.asarray(t_exit), [0.4], atol=1e-4)
