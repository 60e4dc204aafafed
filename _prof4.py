"""Honest per-call timings + bisect chunk_sigma slowness."""
import sys, time, numpy as np, jax, jax.numpy as jnp
from ovr_tpu.core.sampling import sample_volume, intersect_box

key = jax.random.PRNGKey(0)
G = 256
GRID3 = jax.device_put(jax.random.uniform(key, (G, G, G), jnp.float32))
GRID = GRID3.reshape(-1)


def timeit(label, fn, *args, n=10):
    jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{label}: {dt*1e3:9.2f} ms (min {min(ts)*1e3:.2f})", flush=True)
    return dt


CH, S = 64 * 1024, 445
step = 1.0 / 256.0
org = jax.device_put(jax.random.uniform(key, (CH, 3), jnp.float32) * 0.5)
dirn = jax.device_put(
    jax.random.uniform(jax.random.fold_in(key, 1), (CH, 3), jnp.float32) - 0.5)
lo = jnp.zeros(3); hi = jnp.ones(3)


def positions(oo, dd):
    t0 = jnp.zeros((CH,), jnp.float32); t1 = jnp.full((CH,), 3.4e38, jnp.float32)
    t0, t1 = intersect_box(oo, dd, lo, hi, t0, t1)
    t0 = jnp.maximum(t0, 0.0); t1 = jnp.maximum(t1, t0)
    i = jnp.arange(S, dtype=jnp.float32)
    tmid = t0[:, None] + (i[None, :] + 0.5) * step
    p = oo[:, None, :] + tmid[..., None] * dd[:, None, :]
    return jnp.clip(p, 0.0, 1.0)


def main(exps):
    if "idx" in exps:
        # honest random-idx gathers
        for m in (518_400, 28_000_000):
            idx = jax.device_put(jax.random.randint(key, (m,), 0, GRID.shape[0]))
            f = jax.jit(lambda g, i: jnp.sum(g[i]))
            timeit(f"gather 1d {m/1e6:5.1f}M honest", f, GRID, idx)
    if "pos" in exps:
        f = jax.jit(lambda o, d: jnp.sum(positions(o, d)))
        timeit("positions only           ", f, org, dirn)
    if "corner1" in exps:
        @jax.jit
        def f(g, o, d):
            p = positions(o, d)
            c = jnp.clip(p * G - 0.5, 0.0, G - 1.0)
            i0 = jnp.floor(c).astype(jnp.int32)
            idx = (i0[..., 2] * G + i0[..., 1]) * G + i0[..., 0]
            return jnp.sum(g[idx])
        timeit("pos + 1-corner gather     ", f, GRID, org, dirn)
    if "corner8" in exps:
        @jax.jit
        def f(g, o, d):
            p = positions(o, d)
            return jnp.sum(sample_volume(GRID3, p))
        timeit("pos + full trilerp        ", f, GRID, org, dirn)
    if "corner8_flat" in exps:
        @jax.jit
        def f(g, o, d):
            p = positions(o, d).reshape(-1, 3)  # flatten before sampling
            return jnp.sum(sample_volume(GRID3, p))
        timeit("pos + trilerp (flat idx)  ", f, GRID, org, dirn)


if __name__ == "__main__":
    main(sys.argv[1:] or ["idx", "pos", "corner1", "corner8", "corner8_flat"])
