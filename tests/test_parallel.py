"""Device mesh / data-parallel helpers on the 8-device virtual CPU mesh
(conftest forces jax_platforms=cpu + xla_force_host_platform_device_count=8;
SURVEY.md §4's JAX-native way to fake a multi-chip slice)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.parallel import (
    data_parallel_shardings,
    make_mesh,
    replicate,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def test_make_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batch_sh, repl = data_parallel_shardings(mesh)
    x = shard_batch(jnp.arange(16.0).reshape(16, 1), mesh)
    assert x.sharding.is_equivalent_to(batch_sh, ndim=2)
    p = replicate({"w": jnp.ones((3, 3))}, mesh)
    assert p["w"].sharding.is_equivalent_to(repl, ndim=2)


def test_sharded_eval_step_reduces_metrics():
    """A jitted eval step over a sharded batch with replicated params: the
    mean loss must equal the single-device result (XLA inserts the
    cross-device reduction — the reference's dist.all_reduce analog,
    `train/main.py:665-698`)."""
    mesh = make_mesh()
    w = replicate(jnp.full((4, 2), 0.5), mesh)
    xs = np.arange(64.0, dtype=np.float32).reshape(16, 4) / 64.0
    ys = (np.arange(16) % 2).astype(np.int32)
    xb = shard_batch(jnp.asarray(xs), mesh)
    yb = shard_batch(jnp.asarray(ys), mesh)

    @jax.jit
    def eval_step(w, x, y):
        logits = x @ w
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.take_along_axis(logp, y[:, None], 1).mean()
        acc = (logits.argmax(1) == y).mean()
        return loss, acc

    loss, acc = eval_step(w, xb, yb)
    loss1, acc1 = eval_step(jnp.full((4, 2), 0.5), jnp.asarray(xs),
                            jnp.asarray(ys))
    np.testing.assert_allclose(float(loss), float(loss1), rtol=1e-6)
    np.testing.assert_allclose(float(acc), float(acc1), rtol=1e-6)


def test_sharded_train_step_grad_allreduce():
    """Gradients of a mean loss over a sharded batch equal the single-device
    gradients (implicit gradient all-reduce, the DDP analog)."""
    mesh = make_mesh()
    w0 = jnp.ones((4, 4))
    xs = jnp.asarray(np.random.default_rng(0).standard_normal((16, 4)),
                     jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w0, xs)
    g_sharded = jax.jit(jax.grad(loss))(replicate(w0, mesh),
                                        shard_batch(xs, mesh))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_loader_sharding_partitions_epoch():
    """The multi-host shard contract: shards partition the sample set with
    identical epoch-seeded permutations (DistributedSampler analog)."""
    from laudnet_tpu.data.loader import DataLoader

    class FakeDS:
        samples = [(str(i), i) for i in range(32)]

        def __len__(self):
            return 32

        def load(self, i, seed):
            return np.full((2, 2, 3), i, np.float32), i

    batches = {}
    for rank in range(2):
        dl = DataLoader(FakeDS(), batch_size=4, num_workers=2, seed=7,
                        shard=(rank, 2))
        batches[rank] = np.concatenate(
            [lab for _, lab in dl.epoch(3)])
    all_labels = np.concatenate([batches[0], batches[1]])
    assert len(set(all_labels.tolist())) == 32  # disjoint + complete
