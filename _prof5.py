"""Correct march breakdown: fresh jit per variant (no stale cache)."""
import sys, time, dataclasses, numpy as np, jax, jax.numpy as jnp
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.core.sampling import intersect_box, classify, opacity_correction
from ovr_tpu.render.camera import generate_rays, pixel_screen_coords
from ovr_tpu.core import sampling as cs

W, H = 960, 540
RATE = 256.0
S = int(np.ceil(np.sqrt(3) * RATE)) + 2
step = 1.0 / RATE
EARLY = 0.9999

n = 256
zz, yy, xx = np.meshgrid(*([np.linspace(0, 1, n, dtype=np.float32)] * 3), indexing="ij")
g = 0.5 + 0.35 * np.sin(12 * xx) * np.cos(10 * yy) * np.sin(8 * zz)
g += 0.15 * np.exp(-((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2) * 40)
scene = simple_scene(g.astype(np.float32))
cam = Camera.create(from_=(0.5, 0.5, -1.6), at=(0.5, 0.5, 0.5), fovy=45.0)
scene = jax.device_put(dataclasses.replace(scene, camera=cam))

screen = pixel_screen_coords(W, H).reshape(-1, 2)
org, dirn = generate_rays(scene.camera, screen, W, H)
org = jax.device_put(org); dirn = jax.device_put(dirn)
N = org.shape[0]
vol = scene.volume
CT, AT, VR = scene.tfn.color, scene.tfn.alpha, scene.tfn.value_range


def timeit(label, fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{label}: {dt*1e3:9.2f} ms ({W*H/dt/1e6:7.1f} M rays/s)", flush=True)
    return dt


def make_march(sample_fn, classify_fn, loop="while", steps=S):
    def render(grid, org, dirn):
        lo, hi = vol.world_lo, vol.world_hi
        t0 = jnp.zeros((N,), jnp.float32); t1 = jnp.full((N,), 3.4e38, jnp.float32)
        t0, t1 = intersect_box(org, dirn, lo, hi, t0, t1)
        t0 = jnp.maximum(t0, 0.0); t1 = jnp.maximum(t1, t0)
        tx = t0; ty = jnp.minimum(t1, t0 + step)
        color = jnp.zeros((N, 3)); alpha = jnp.zeros((N,))

        def stepf(carry):
            tx, ty, color, alpha = carry
            active = (ty > tx) & (alpha < EARLY)
            mid = 0.5 * (tx + ty)
            p = org + mid[:, None] * dirn
            s = sample_fn(grid, jnp.clip(p, 0., 1.))
            rgb, a = classify_fn(CT, AT, VR, s)
            a = opacity_correction(a, 1.0, ty - tx)
            aw = jnp.where(active, a, 0.0)
            tr = 1.0 - alpha
            color = color + (tr * aw)[:, None] * jnp.clip(rgb, 0, 1)
            alpha = alpha + tr * aw
            txn = jnp.where(active, ty, tx)
            tyn = jnp.where(active, jnp.minimum(ty + step, t1), ty)
            return (txn, tyn, color, alpha)

        if loop == "while":
            def cond(state):
                i, (tx, ty, c, a) = state
                return (i < steps) & jnp.any((ty > tx) & (a < EARLY))
            def body(state):
                i, carry = state
                return (i + 1, stepf(carry))
            cnt, (tx, ty, color, alpha) = jax.lax.while_loop(
                cond, body, (jnp.int32(0), (tx, ty, color, alpha)))
            return color, alpha, cnt
        else:
            def body(carry, _):
                return stepf(carry), None
            (tx, ty, color, alpha), _ = jax.lax.scan(
                body, (tx, ty, color, alpha), None, length=steps)
            return color, alpha, jnp.int32(steps)
    return jax.jit(render)


cheap_classify = lambda ct, at, vr, s: (jnp.stack([s, 1 - s, s], -1), s * 0.4)
cheap_sample = lambda grid, p: 0.5 + 0.3 * jnp.sin(12 * p[..., 0]) * jnp.cos(10 * p[..., 1])


def real_classify(ct, at, vr, s):
    return classify(ct, at, vr, s)


def main(exps):
    if "count" in exps:
        f = make_march(cs.sample_volume, real_classify)
        _, _, cnt = f(vol.grid, org, dirn)
        print("while-loop iterations:", int(cnt), "of", S, flush=True)
    if "base" in exps:
        f = make_march(cs.sample_volume, real_classify)
        timeit("march while full          ", f, vol.grid, org, dirn)
    if "cheap_tf" in exps:
        f = make_march(cs.sample_volume, cheap_classify)
        timeit("march while cheap-TF      ", f, vol.grid, org, dirn)
    if "cheap_vol" in exps:
        f = make_march(cheap_sample, real_classify)
        timeit("march while cheap-volume  ", f, vol.grid, org, dirn)
    if "both" in exps:
        f = make_march(cheap_sample, cheap_classify)
        timeit("march while both-cheap    ", f, vol.grid, org, dirn)
    if "scan" in exps:
        f = make_march(cs.sample_volume, real_classify, loop="scan")
        timeit("march scan-445 full       ", f, vol.grid, org, dirn)


if __name__ == "__main__":
    main(sys.argv[1:] or ["count", "base", "cheap_tf", "cheap_vol", "both", "scan"])
