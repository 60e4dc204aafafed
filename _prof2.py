"""Experiment: two-phase (bulk-gather + fused Pallas composite) vs loop march.

Usage: python _prof2.py [exp ...]   exps: gather full chunked bf16 loop pallas
"""
import sys, time, dataclasses, functools, numpy as np, jax, jax.numpy as jnp
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.core.sampling import sample_volume, intersect_box
from ovr_tpu import api
from ovr_tpu.render.camera import generate_rays, pixel_screen_coords
from ovr_tpu.ops.composite import tf_composite_pallas, tf_composite_reference

W, H = 960, 540
RATE = 256.0
S = int(np.ceil(np.sqrt(3) * RATE)) + 2
step = 1.0 / RATE


def setup():
    n = 256
    z, y, x = np.meshgrid(*([np.linspace(0, 1, n, dtype=np.float32)] * 3), indexing="ij")
    g = 0.5 + 0.35 * np.sin(12 * x) * np.cos(10 * y) * np.sin(8 * z)
    g += 0.15 * np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) * 40)
    scene = simple_scene(g.astype(np.float32))
    cam = Camera.create(from_=(0.5, 0.5, -1.6), at=(0.5, 0.5, 0.5), fovy=45.0)
    scene = jax.device_put(dataclasses.replace(scene, camera=cam))
    screen = pixel_screen_coords(W, H).reshape(-1, 2)
    org, dirn = generate_rays(scene.camera, screen, W, H)
    return scene, jax.device_put(org), jax.device_put(dirn)


def timeit(label, fn, *args, n=5):
    t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:8.2f} ms  ({W*H/dt/1e6:7.1f} M rays/s) [compile {tc:.1f}s]", flush=True)
    return dt


def chunk_sigma(grid, oo, dd, lo, hi):
    ch = oo.shape[0]
    t0 = jnp.zeros((ch,), jnp.float32); t1 = jnp.full((ch,), 3.4e38, jnp.float32)
    t0, t1 = intersect_box(oo, dd, lo, hi, t0, t1)
    t0 = jnp.maximum(t0, 0.0); t1 = jnp.maximum(t1, t0)
    i = jnp.arange(S, dtype=jnp.float32)
    tmid = t0[:, None] + (i[None, :] + 0.5) * step
    dt = jnp.clip(t1[:, None] - (t0[:, None] + i[None, :] * step), 0.0, step)
    p = oo[:, None, :] + tmid[..., None] * dd[:, None, :]
    p_obj = (p - lo) / (hi - lo)
    sig = sample_volume(grid, p_obj)
    return sig, dt


def make_chunked(CH, N):
    @jax.jit
    def two_phase_chunked(grid, ct, at, vr, org, dirn, lo, hi):
        pad = (-N) % CH
        o = jnp.pad(org, ((0, pad), (0, 0)))
        d = jnp.pad(dirn, ((0, pad), (0, 0)), constant_values=1.0)
        o = o.reshape(-1, CH, 3); d = d.reshape(-1, CH, 3)

        def chunk(c):
            oo, dd = c
            sig, dt = chunk_sigma(grid, oo, dd, lo, hi)
            return tf_composite_pallas(sig, dt, ct, at, vr, jnp.float32(1.0))

        col, al = jax.lax.map(chunk, (o, d))
        return col.reshape(-1, 3)[:N], al.reshape(-1)[:N]
    return two_phase_chunked


def make_chunked_gather_only(CH, N):
    @jax.jit
    def f(grid, org, dirn, lo, hi):
        pad = (-N) % CH
        o = jnp.pad(org, ((0, pad), (0, 0)))
        d = jnp.pad(dirn, ((0, pad), (0, 0)), constant_values=1.0)
        o = o.reshape(-1, CH, 3); d = d.reshape(-1, CH, 3)

        def chunk(c):
            oo, dd = c
            sig, dt = chunk_sigma(grid, oo, dd, lo, hi)
            return jnp.sum(sig * dt, axis=-1)

        s = jax.lax.map(chunk, (o, d))
        return s.reshape(-1)[:N]
    return f


def main(exps):
    scene, org, dirn = setup()
    N = org.shape[0]
    vol = scene.volume
    ct, at_, vr = scene.tfn.color, scene.tfn.alpha, scene.tfn.value_range
    if "pallas" in exps:  # kernel-only timing on precomputed sigma
        sig = jnp.zeros((64 * 1024, S), jnp.float32) + 0.5
        dt = jnp.full((64 * 1024, S), step, jnp.float32)
        f = jax.jit(lambda s, d: tf_composite_pallas(s, d, ct, at_, vr, jnp.float32(1.0)))
        timeit("pallas kernel 64k x S    ", f, sig, dt)
    if "chunked-gather" in exps:
        for ch in (16 * 1024, 64 * 1024):
            f = make_chunked_gather_only(ch, N)
            timeit(f"chunked gather {ch//1024:3d}k      ", f, vol.grid, org, dirn, vol.world_lo, vol.world_hi)
    if "bf16" in exps:
        f = make_chunked_gather_only(64 * 1024, N)
        timeit("chunked gather bf16 64k  ", f, vol.grid.astype(jnp.bfloat16), org, dirn, vol.world_lo, vol.world_hi)
    if "chunked" in exps:
        for ch in (64 * 1024,):
            f = make_chunked(ch, N)
            timeit(f"two-phase chunked {ch//1024:3d}k   ", f, vol.grid, ct, at_, vr, org, dirn, vol.world_lo, vol.world_hi)
    if "loop" in exps:
        cfg = api.RenderConfig(width=W, height=H, spp=1, sampling_rate=RATE,
                               shading="none", fast_math=True).resolved(scene)
        timeit("loop march (no mc)       ", lambda: api.render(scene, cfg).rgba)


if __name__ == "__main__":
    main(sys.argv[1:] or ["pallas", "chunked-gather", "bf16", "chunked", "loop"])
