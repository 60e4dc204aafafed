"""Worker for tests/test_multihost.py: one coordinated CPU process.

Run as: python multihost_worker.py <coordinator> <num_processes> <pid>
Prints one line `RESULT pid=<i> loss=<x> rows=<n>` on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2").strip()

import numpy as np  # noqa: E402


def main():
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from ovr_tpu.parallel import multihost
    multihost.initialize(coordinator, nproc, pid)

    import jax.numpy as jnp
    assert len(jax.devices()) == nproc * 2, jax.devices()

    from ovr_tpu import api
    from ovr_tpu.core.scene import Camera, simple_scene
    from ovr_tpu.parallel import tiles
    import dataclasses

    n = 12
    z, y, x = np.meshgrid(*([np.linspace(0, 1, n)] * 3), indexing="ij")
    grid = (0.5 + 0.5 * np.sin(5 * x) * np.cos(4 * y) * np.sin(3 * z)
            ).astype(np.float32)
    scene = dataclasses.replace(
        simple_scene(grid),
        camera=Camera.create(from_=(0.5, 0.5, -1.8), at=(0.5, 0.5, 0.5),
                             fovy=45.0))

    mesh = multihost.global_mesh(n_bricks=1)
    n_tiles = mesh.shape["tiles"]
    h = 2 * n_tiles
    cfg = api.RenderConfig(width=8, height=h, spp=1, sampling_rate=8.0,
                           shading="none").resolved(scene)

    # forward: rows sharded across hosts (DCN axis)
    frame = tiles.render_sharded(scene, cfg, mesh)
    img = multihost.gather_frame(frame)
    assert img.shape == (h, 8, 4), img.shape
    assert np.all(np.isfinite(img))

    # distributed train step: grads psum'd over all hosts' devices
    state = tiles.init_train_state(scene)
    step = tiles.make_train_step(cfg, mesh, lr=1e-2)
    target = np.zeros((h, 8, 4), np.float32)
    state, loss = step(state, scene, scene.camera, target)
    print(f"RESULT pid={pid} loss={float(loss):.8f} rows={img.shape[0]}",
          flush=True)


if __name__ == "__main__":
    main()
