"""Minimal standalone volume renderer — the embedding surface.

Mirror of the reference's `projects/experiment/mini_optix7` /
`mini_ospray` standalone renderers (`README.md:21-23`: "simplified
versions of the main renderer … useful for embedded rendering"): build a
scene from raw arrays, march it with the core integrator, write a PNG —
no `api.Renderer` facade, no scene files, ~100 lines.

Usage: JAX_PLATFORMS=cpu python examples/mini_renderer.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from ovr_tpu import api
from ovr_tpu.core.scene import Camera, simple_scene


def make_volume(n: int = 64) -> np.ndarray:
    """The repo's synthetic multi-frequency test volume."""
    ax = np.linspace(0, 1, n, dtype=np.float32)
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    g = 0.5 + 0.35 * np.sin(12 * x) * np.cos(10 * y) * np.sin(8 * z)
    g += 0.15 * np.exp(-((x - 0.5) ** 2 + (y - 0.5) ** 2
                         + (z - 0.5) ** 2) * 40)
    return g.astype(np.float32)


def main() -> None:
    import dataclasses

    # 1. Scene: volume in a [0,1]^3 box + a default rainbow transfer
    #    function (simple_scene), perspective camera, headlight.
    scene = simple_scene(make_volume())
    scene = dataclasses.replace(
        scene, camera=Camera.create(from_=(0.5, 0.4, -1.6),
                                    at=(0.5, 0.5, 0.5), fovy=45.0))

    # 2. Config: the march integrator (the general, differentiable path —
    #    what an embedder starts from; method="auto" would pick the fused
    #    shear-warp fast path when eligible).
    cfg = api.RenderConfig(width=320, height=240, sampling_rate=96.0,
                           shading="diffuse", method="auto").resolved(scene)

    # 3. Render: returns premultiplied rgba + gradient/depth channels.
    frame = jax.jit(lambda s: api.render(s, cfg))(scene)
    rgba = np.asarray(frame.rgba)

    # 4. Composite onto white and save.
    rgb = rgba[..., :3] + (1.0 - rgba[..., 3:4])
    from ovr_tpu.io.image import save_image
    out = os.path.join(os.path.dirname(__file__), "mini_render.png")
    save_image(out, rgb)
    print(f"wrote {out}  (alpha mean {rgba[..., 3].mean():.3f})")

    # 5. The same render is differentiable end to end — the gradient of a
    #    loss w.r.t. the volume densities comes straight from jax.grad:
    def loss(grid):
        s = dataclasses.replace(
            scene, volume=dataclasses.replace(scene.volume, grid=grid))
        return jnp.mean(api.render(s, cfg).rgba ** 2)

    g = jax.grad(loss)(scene.volume.grid)
    print(f"d loss / d grid: shape {g.shape}, |g| {float(jnp.abs(g).mean()):.2e}")


if __name__ == "__main__":
    main()
