"""Micro-benchmarks: gather shapes, step-loop floors."""
import sys, time, numpy as np, jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)
GRID = jax.device_put(jax.random.uniform(key, (256 * 256 * 256,), jnp.float32))


def timeit(label, fn, *args, n=5):
    t0 = time.perf_counter(); jax.block_until_ready(fn(*args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:9.2f} ms [compile {tc:.1f}s]", flush=True)
    return dt


def main(exps):
    if "g1d" in exps:
        for m in (518_400, 4_000_000, 28_000_000):
            idx = jax.device_put(jax.random.randint(key, (m,), 0, GRID.shape[0]))
            f = jax.jit(lambda g, i: jnp.sum(g[i]))
            timeit(f"gather 1d {m/1e6:5.1f}M idx", f, GRID, idx)
    if "g2d" in exps:
        for shape in ((64 * 1024, 445), (445, 64 * 1024), (28_000_000 // 128, 128)):
            idx = jax.device_put(jax.random.randint(key, shape, 0, GRID.shape[0]))
            f = jax.jit(lambda g, i: jnp.sum(g[i]))
            timeit(f"gather 2d {str(shape):>16} ", f, GRID, idx)
    if "g2dflat" in exps:
        idx = jax.device_put(jax.random.randint(key, (64 * 1024, 445), 0, GRID.shape[0]))
        f = jax.jit(lambda g, i: jnp.sum(g[i.reshape(-1)]))
        timeit("gather 2d->flat 28M      ", f, GRID, idx)
    if "steploop" in exps:
        n = 518_400
        org = jax.device_put(jax.random.uniform(key, (n, 3)))

        @jax.jit
        def loop_gather(g, org):
            def body(i, acc):
                p = org[:, 0] * 255.0 + i  # fake per-step coordinate
                idx = jnp.clip(p.astype(jnp.int32) * 65536, 0, g.shape[0] - 1)
                return acc + g[idx]
            return jnp.sum(jax.lax.fori_loop(0, 445, body, jnp.zeros((n,))))
        timeit("step-loop 445x 518k 1-gather", loop_gather, GRID, org)

        @jax.jit
        def loop_gather8(g, org):
            def body(i, acc):
                base = jnp.clip((org[:, 0] * 255.0 + i).astype(jnp.int32) * 65536,
                                0, g.shape[0] - 257)
                s = 0.0
                for off in (0, 1, 256, 257, 65536, 65537, 65792, 65793):
                    s = s + g[base + off]
                return acc + s
            return jnp.sum(jax.lax.fori_loop(0, 445, body, jnp.zeros((n,))))
        timeit("step-loop 445x 518k 8-gather", loop_gather8, GRID, org)

        @jax.jit
        def loop_carry(org):
            def body(i, carry):
                tx, ty, c, gr, a = carry
                active = a < 0.999
                aa = jnp.where(active, 0.01, 0.0)
                c = c + aa[:, None] * 0.5
                gr = gr + aa[:, None] * 0.1
                a = a + (1 - a) * aa
                return (ty, ty + 0.01, c, gr, a)
            z3 = jnp.zeros((n, 3)); z = jnp.zeros((n,))
            out = jax.lax.fori_loop(0, 445, body, (z, z, z3, z3, z))
            return jnp.sum(out[2])
        timeit("step-loop 445x carry-only  ", loop_carry, org)


if __name__ == "__main__":
    main(sys.argv[1:] or ["g1d", "g2d", "g2dflat", "steploop"])
