"""Checkpoint/resume utilities (utils.checkpoint; SURVEY §5.3-5.4 gap)."""

import jax.numpy as jnp
import numpy as np

from ovr_tpu.utils import checkpoint as ck


def _state():
    return {
        "params": {"w": jnp.arange(6.0).reshape(2, 3),
                   "b": jnp.ones((3,), jnp.float32)},
        "step": jnp.int32(7),
    }


class TestPytreeSnapshots:
    def test_roundtrip(self, tmp_path):
        d = str(tmp_path / "ckpt")
        state = _state()
        ck.save_pytree(d, 7, state)
        assert ck.latest_step(d) == 7
        restored = ck.load_pytree(d, 7, _zeros_like(state))
        for a, b in zip(_leaves(restored), _leaves(state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_latest_of_many(self, tmp_path):
        d = str(tmp_path / "ckpt")
        for s in (1, 12, 5):
            ck.save_pytree(d, s, _state())
        assert ck.latest_step(d) == 12

    def test_latest_missing_dir(self, tmp_path):
        assert ck.latest_step(str(tmp_path / "nope")) is None


def _zeros_like(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), tree)


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


import jax  # noqa: E402


class TestFrameCheckpointer:
    def test_resume_skips_done(self, tmp_path):
        c = ck.FrameCheckpointer(str(tmp_path), "orbit_")
        assert not c.done(0)
        # simulate a completed frame
        open(c.frame_path(0), "wb").write(b"png")
        c.commit(0, meta={"t": 0.0})
        assert c.done(0) and not c.done(1)
        # a fresh checkpointer sees the progress
        c2 = ck.FrameCheckpointer(str(tmp_path), "orbit_")
        assert c2.done(0)
        assert c2.meta["0"]["t"] == 0.0

    def test_atomic_meta(self, tmp_path):
        c = ck.FrameCheckpointer(str(tmp_path), "f_")
        for i in range(3):
            open(c.frame_path(i), "wb").write(b"x")
            c.commit(i)
        c2 = ck.FrameCheckpointer(str(tmp_path), "f_")
        assert sorted(c2.meta) == ["0", "1", "2"]
