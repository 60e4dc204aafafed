"""Sparse/foveated sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.render import sparse


def test_keep_probability_shape_and_peak():
    f = sparse.FocusParams.create(center=(0.25, 0.5), scale=0.1,
                                  base_noise=0.05)
    p = np.asarray(sparse.keep_probability(32, 16, f))
    assert p.shape == (16, 32)
    # peak at the focus center, floor = base_noise far away
    assert p[8, 8] > 0.9
    assert abs(p[8, 31] - 0.05) < 0.05
    assert np.all((p > 0) & (p <= 1))


def test_select_samples_concentrated_at_focus():
    f = sparse.FocusParams.create(center=(0.5, 0.5), scale=0.1,
                                  base_noise=0.02)
    idx = np.asarray(sparse.select_samples(
        jax.random.PRNGKey(0), 64, 64, f, 0, budget=256))
    assert idx.shape == (256,)
    assert len(np.unique(idx)) == 256  # no duplicates
    x = (idx % 64) / 64.0
    y = (idx // 64) / 64.0
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2)
    # samples cluster near the focus: mean radius far below uniform (~0.38)
    assert r.mean() < 0.25


def test_noise_varies_with_frame_index():
    a = sparse.sample_noise(jax.random.PRNGKey(0), 32, 32, 0)
    b = sparse.sample_noise(jax.random.PRNGKey(0), 32, 32, 1)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_render_sparse_scatters_into_prev(small_grid):
    scene = simple_scene(small_grid)
    cam = Camera.create(from_=(0.5, 0.5, -1.5), at=(0.5, 0.5, 0.5), fovy=45.0)
    cfg = api.RenderConfig(width=16, height=16, spp=1, sampling_rate=16.0,
                           shading="none").resolved(scene)
    dense = api.render(scene, cfg, camera=cam)

    frame, idx = sparse.render_sparse(
        scene, cfg, camera=cam, frame_index=0, key=jax.random.PRNGKey(1),
        budget=64)
    rgba = np.asarray(frame.rgba)
    idx = np.asarray(idx)
    dense_rgba = np.asarray(dense.rgba)
    # sampled pixels match the dense render exactly; others are untouched (0)
    flat = rgba.reshape(-1, 4)
    dflat = dense_rgba.reshape(-1, 4)
    np.testing.assert_allclose(flat[idx], dflat[idx], atol=1e-5)
    mask = np.ones(16 * 16, bool)
    mask[idx] = False
    assert np.all(flat[mask] == 0)

    # second sparse pass fills more pixels, preserving previous ones
    frame2, idx2 = sparse.render_sparse(
        scene, cfg, camera=cam, frame_index=1, key=jax.random.PRNGKey(2),
        budget=64, prev_frame=frame)
    flat2 = np.asarray(frame2.rgba).reshape(-1, 4)
    np.testing.assert_allclose(flat2[idx], dflat[idx], atol=1e-5)
    np.testing.assert_allclose(flat2[idx2], dflat[idx2], atol=1e-5)


def test_utils_timers(tmp_path, monkeypatch):
    from ovr_tpu.utils.timers import CsvLogger, FPSCounter, Timer
    t = Timer()
    t.start()
    x = jnp.ones(8) * 2
    dt = t.stop(fence=x)
    assert dt >= 0 and t.milliseconds() >= 0
    c = FPSCounter()
    for _ in range(3):
        c.frame()
    assert c.fps > 0
    monkeypatch.chdir(tmp_path)
    log = CsvLogger(["frame", "ms"])
    log.log(1, 2.5)
    assert "benchmarks" in log.path
    text = open(log.path).read()
    assert "frame,ms" in text and "1,2.5" in text


def test_blue_noise_spectrum_is_blue():
    """Void-and-cluster output must concentrate spectral energy in high
    frequencies (the property `random/blue_noise.h` embeds a texture for)."""
    from ovr_tpu.render.bluenoise import void_and_cluster
    n = 32
    bn = void_and_cluster(n, seed=1, cache=False)
    rng = np.random.default_rng(0)
    uni = rng.uniform(size=(n, n)).astype(np.float32)

    def lowfreq_energy(img):
        f = np.fft.fftshift(np.abs(np.fft.fft2(img - img.mean())) ** 2)
        c = n // 2
        y, x = np.mgrid[:n, :n]
        r = np.hypot(y - c, x - c)
        low = f[(r > 0) & (r < n / 8)].sum()
        return low / f[r > 0].sum()
    # thresholding any level is well spaced -> little low-frequency energy
    assert lowfreq_energy(bn) < 0.5 * lowfreq_energy(uni)
    # it's a permutation of ranks: every value distinct, uniform histogram
    assert len(np.unique(bn)) == n * n


def test_stbn_temporal_coverage():
    """Consecutive sparse frames must select complementary, stable pixel
    sets (the reference's temporal-STBN property)."""
    from ovr_tpu.render import sparse

    focus = sparse.FocusParams.create(scale=10.0, base_noise=1.0)  # uniform p
    key = jax.random.PRNGKey(0)
    w = h = sparse.STBN_SIZE
    budget = (w * h) // 16
    sets = []
    for f in range(4):
        idx = np.asarray(sparse.select_samples(key, w, h, focus, f, budget))
        sets.append(set(idx.tolist()))
    # deterministic: same frame -> same set
    idx_again = np.asarray(sparse.select_samples(key, w, h, focus, 0, budget))
    assert set(idx_again.tolist()) == sets[0]
    # complementary: 4 x 1/16 budgets overlap far less than random
    # (random overlap expectation per pair: budget/16)
    union = set().union(*sets)
    assert len(union) > 0.9 * 4 * budget


def test_accumulation_variance_decreases(small_grid):
    from ovr_tpu import api
    from ovr_tpu.core.scene import simple_scene

    scene = simple_scene(small_grid)
    cfg = api.RenderConfig(width=8, height=8, spp=1, sampling_rate=16.0,
                           shading="none", jitter_rays=True).resolved(scene)
    accum = None
    variances = []
    for i in range(1, 6):
        f = api.render(scene, cfg, frame_index=jnp.int32(i))
        disp, accum = api.accumulate(f, accum, i)
        variances.append(api.variance_of(accum, i))
    assert variances[0] == float("inf")
    assert np.isfinite(variances[-1])
    assert variances[-1] <= variances[1] + 1e-6
    # depth accumulates too (full-channel accumulation)
    assert disp.depth is not None and np.all(np.isfinite(np.asarray(disp.depth)))
