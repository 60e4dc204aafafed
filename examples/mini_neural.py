"""Minimal neural-field volume demo — fit, render, differentiate.

Mirror of the reference's `projects/experiment/mini_pytorch` /
`mini_tensorrt` NN-in-the-loop examples (`README.md:21-23`) and its
"add neural representation renderer" TODO (`README.md:12`): fit a
hash-grid MLP to a dense volume, render it through the baked-proxy
shear-warp fast path, and take gradients of a render loss w.r.t. the
network weights — all with jax.grad, no interop layer.

Usage: JAX_PLATFORMS=cpu python examples/mini_neural.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene
from ovr_tpu.neural.field import HashGridConfig, init_field
from ovr_tpu.neural.train import bake_grid_host, fit_to_grid


def main() -> None:
    # 1. Target: a dense synthetic volume.
    n = 48
    ax = np.linspace(0, 1, n, dtype=np.float32)
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    target = (0.5 + 0.4 * np.sin(9 * x) * np.cos(7 * y) * np.sin(5 * z)
              ).astype(np.float32)

    # 2. Fit a hash-grid MLP to it by random point sampling.
    field = init_field(jax.random.PRNGKey(0),
                       HashGridConfig(n_levels=8, max_resolution=64),
                       hidden=32, n_hidden=2)
    field, losses = fit_to_grid(field, jnp.asarray(target), steps=200,
                                batch=1 << 12, lr=5e-3)
    print(f"fit: loss {float(losses[0]):.4f} -> {float(losses[-1]):.4f}")

    # 3. Render the FIELD (not the target): the field is the scene volume;
    #    commit-time proxy baking routes it through the fast path.
    scene = simple_scene(target)  # TF/box template...
    scene = dataclasses.replace(
        scene, volume=field,  # ...with the neural field as the volume
        camera=Camera.create(from_=(0.5, 0.4, -1.5), at=(0.5, 0.5, 0.5),
                             fovy=45.0))
    cfg = api.RenderConfig(width=160, height=120, sampling_rate=48.0,
                           shading="diffuse", method="auto",
                           neural_proxy_res=64).resolved(scene)
    proxy = bake_grid_host(scene.volume, (64, 64, 64))
    frame = api.render(scene, cfg, proxy_grid=proxy)
    rgba = np.asarray(frame.rgba)
    from ovr_tpu.io.image import save_image
    out = os.path.join(os.path.dirname(__file__), "mini_neural.png")
    save_image(out, rgba[..., :3] + (1.0 - rgba[..., 3:4]))
    print(f"wrote {out}  (alpha mean {rgba[..., 3].mean():.3f})")

    # 4. End-to-end gradients: render loss -> proxy bake -> MLP weights
    #    (api.render bakes the proxy inside the traced graph, so the
    #    whole chain differentiates).
    def render_loss(tables, weights):
        f2 = dataclasses.replace(scene.volume, tables=tables,
                                 weights=weights)
        s2 = dataclasses.replace(scene, volume=f2)
        return jnp.mean(api.render(s2, cfg).rgba ** 2)

    g_tab, g_w = jax.grad(render_loss, argnums=(0, 1))(
        scene.volume.tables, scene.volume.weights)
    g0 = g_w[0][0]
    print(f"d loss / d W0: shape {g0.shape}, |g| {float(jnp.abs(g0).mean()):.2e}")


if __name__ == "__main__":
    main()
