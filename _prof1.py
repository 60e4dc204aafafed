import time, dataclasses, sys, numpy as np, jax, jax.numpy as jnp
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu import api
from ovr_tpu.render import accel
import ovr_tpu.core.sampling as cs
import ovr_tpu.render.integrator as ig
from ovr_tpu.neural import field as nf

W, H = 960, 540
n=256
z, y, x = np.meshgrid(*([np.linspace(0, 1, n, dtype=np.float32)] * 3), indexing="ij")
g = 0.5 + 0.35 * np.sin(12 * x) * np.cos(10 * y) * np.sin(8 * z)
g += 0.15 * np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) * 40)
scene = simple_scene(g.astype(np.float32))
cam = Camera.create(from_=(0.5, 0.5, -1.6), at=(0.5, 0.5, 0.5), fovy=45.0)
scene = jax.device_put(dataclasses.replace(scene, camera=cam))

cfg = api.RenderConfig(width=W, height=H, spp=1, sampling_rate=256.0,
                       shading="none", fast_math=True, use_macrocells=True).resolved(scene)
mc = jax.device_put(accel.build_macrocells(scene.volume.grid, scene.tfn.alpha, scene.tfn.value_range))

def timeit(label, fn, n=3):
    t0=time.perf_counter(); jax.block_until_ready(fn(0).rgba)
    tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for i in range(1,n+1): out=fn(i)
    jax.block_until_ready(out.rgba); dt=(time.perf_counter()-t0)/n
    print(f"{label}: {dt*1e3:7.1f} ms/frame ({W*H/dt/1e6:6.1f} M rays/s) [compile {tc:.0f}s]", flush=True)

timeit("baseline none+mc   ", lambda i: api.render(scene, cfg, frame_index=i, macrocells=mc))

orig_classify = cs.classify
def cheap_classify(ct, at, vr, s):
    v = jnp.clip((s - vr[...,0])/(vr[...,1]-vr[...,0]), 0., 1.)
    return jnp.stack([v, 1.0-v, v*v], axis=-1), v*0.4
cs.classify = cheap_classify; ig.classify = cheap_classify
timeit("cheap TF (no gathr)", lambda i: api.render(scene, cfg, frame_index=i, macrocells=mc))
cs.classify = orig_classify; ig.classify = orig_classify

orig_sample = nf.sample_any_volume
def cheap_sample(grid, p):
    if hasattr(grid, 'ndim') and getattr(grid,'ndim',0) == 3:
        return 0.5 + 0.3*jnp.sin(12*p[...,0])*jnp.cos(10*p[...,1])
    return orig_sample(grid, p)
nf.sample_any_volume = cheap_sample; ig.sample_any_volume = cheap_sample
timeit("cheap volume sample", lambda i: api.render(scene, cfg, frame_index=i, macrocells=mc))
cs.classify = cheap_classify; ig.classify = cheap_classify
timeit("both cheap         ", lambda i: api.render(scene, cfg, frame_index=i, macrocells=mc))
