"""CheckpointManager behavior: rolling meta-sidecar GC, best survival,
restore round-trip (reference `utils/utils.py:8-17` save/model_best)."""

import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.train.checkpoint import CheckpointManager


def _state(v: float):
    return {"w": jnp.full((4,), v, jnp.float32), "step": jnp.int32(int(v))}


def test_meta_sidecars_gc_with_rolling_checkpoints(tmp_path):
    import os

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for step in (1, 2, 3):
        ckpt.save(step, _state(step), metadata={"epoch": step})
    metas = sorted(n for n in os.listdir(ckpt.directory)
                   if n.startswith("meta_"))
    # max_to_keep=2: step 1's checkpoint was GC'd, so must its sidecar be
    assert metas == ["meta_2.json", "meta_3.json"]
    state, meta = ckpt.restore(jax.eval_shape(lambda: _state(0)))
    assert meta == {"epoch": 3}
    np.testing.assert_allclose(np.asarray(state["w"]), 3.0)
    ckpt.close()


def test_best_checkpoint_survives_rolling_gc(tmp_path):
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    ckpt.save(1, _state(1), metadata={"val": 10.0}, is_best=True)
    ckpt.save(2, _state(2), metadata={"val": 5.0})
    ckpt.save(3, _state(3), metadata={"val": 6.0})
    best, meta = ckpt.restore_best(jax.eval_shape(lambda: _state(0)))
    np.testing.assert_allclose(np.asarray(best["w"]), 1.0)
    assert meta["val"] == 10.0
    ckpt.close()
