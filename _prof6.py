"""Feasibility: dense separable slab resampling on MXU.

sig[k,h,w] = sum_y Wy[k,h,y] * (sum_x vol'[k,y,x] * Wx[k,x,w])
with vol' = Wz @ vol (z-resample), W* banded linear-interp matrices.
"""
import sys, time, numpy as np, jax, jax.numpy as jnp

Z = Y = X = 256
K = 512
Hs, Ws = 540, 960
key = jax.random.PRNGKey(0)
VOL = jax.device_put(jax.random.uniform(key, (Z, Y, X), jnp.float32))


def timeit(label, fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{label}: {dt*1e3:9.2f} ms", flush=True)
    return dt


def interp_matrix(src_coords, n_src, dtype=jnp.bfloat16):
    """(..., M) continuous source coords -> (..., n_src, M) linear-interp
    weights, built densely with iota comparisons (fused on VPU)."""
    c = jnp.clip(src_coords, 0.0, n_src - 1.0)
    i = jnp.arange(n_src, dtype=jnp.float32)
    # hat function: w = max(0, 1 - |i - c|)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(i[:, None] - c[..., None, :]))
    return w.astype(dtype)


def make_pipeline(dtype):
    @jax.jit
    def render(vol, a_k, b_k, ah_k, bh_k, zc):
        # z-resample: (K, Z) @ (Z, Y*X)
        Wz = interp_matrix(zc, Z, dtype)  # (K... wait zc is (K,) -> (Z, K)
        volf = vol.astype(dtype).reshape(Z, Y * X)
        volk = jnp.einsum("zk,zm->km", Wz.reshape(Z, K), volf,
                          preferred_element_type=jnp.float32)
        volk = volk.reshape(K, Y, X).astype(dtype)
        # per-slice x coords: u(k, w) = a_k + b_k * w
        wgrid = jnp.arange(Ws, dtype=jnp.float32)
        ugrid = a_k[:, None] + b_k[:, None] * wgrid[None, :]  # (K, Ws)
        Wx = interp_matrix(ugrid, X, dtype)  # (K, X, Ws)
        t1 = jnp.einsum("kyx,kxw->kyw", volk, Wx,
                        preferred_element_type=jnp.float32).astype(dtype)
        hgrid = jnp.arange(Hs, dtype=jnp.float32)
        vgrid = ah_k[:, None] + bh_k[:, None] * hgrid[None, :]  # (K, Hs)
        Wy = interp_matrix(vgrid, Y, dtype)  # (K, Y, Hs)
        sig = jnp.einsum("kyw,kyh->khw", t1, Wy,
                         preferred_element_type=jnp.float32)
        return jnp.sum(sig * sig)  # nonlinear: not algebraically collapsible
    return render


def main(exps):
    a_k = jnp.linspace(10.0, 30.0, K)
    b_k = jnp.linspace(0.2, 0.26, K)
    ah_k = jnp.linspace(5.0, 20.0, K)
    bh_k = jnp.linspace(0.4, 0.5, K)
    zc = jnp.linspace(0.0, Z - 1.0, K)  # (K,) z sample positions
    if "bf16" in exps:
        f = make_pipeline(jnp.bfloat16)
        timeit("slab resample bf16 K=512  ", f, VOL, a_k, b_k, ah_k, bh_k, zc)
    if "f32" in exps:
        f = make_pipeline(jnp.float32)
        timeit("slab resample f32  K=512  ", f, VOL, a_k, b_k, ah_k, bh_k, zc)


if __name__ == "__main__":
    main(sys.argv[1:] or ["bf16", "f32"])
