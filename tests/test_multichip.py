"""Multi-device SPMD training on the virtual 8-device CPU mesh:
data-parallel equivalence with the single-device step (XLA's inserted
gradient all-reduce must reproduce large-batch training exactly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _batch, _tiny_hp
from bisinger_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from bisinger_tpu.training.tasks import AuxDecoderMIDITask


@pytest.fixture(scope="module")
def env():
    hp = _tiny_hp()
    vocab = 32
    task = AuxDecoderMIDITask(hp, vocab)
    batch = _batch(8, 16, 64, vocab)  # one sample per device
    rng = jax.random.PRNGKey(0)

    def fresh_state():
        # train_step donates its state (buffers are deleted after the
        # call), so every test takes a fresh deterministic copy
        return task.init_state(jax.random.PRNGKey(0), batch)

    return task, fresh_state, batch, rng


def test_mesh_construction():
    mesh = make_mesh(num_data=8, num_model=1)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh42 = make_mesh(num_data=4, num_model=2)
    assert mesh42.shape["data"] == 4 and mesh42.shape["model"] == 2


def test_shard_batch_places_across_devices(env):
    task, fresh_state, batch, rng = env
    mesh = make_mesh(num_data=8, num_model=1)
    sharded = shard_batch(batch, mesh)
    sh = sharded["txt_tokens"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), sharded["txt_tokens"].ndim)
    # 8 shards, one per device
    assert len(sharded["mels"].addressable_shards) == 8


def test_dp_step_matches_single_device(env):
    """One sharded train step == one unsharded step on the same batch."""
    task, fresh_state, batch, rng = env
    mesh = make_mesh(num_data=8, num_model=1)

    ref_state, ref_losses = task.train_step(fresh_state(), batch, rng)

    with mesh:
        st = jax.device_put(fresh_state(), replicate_sharding(mesh))
        sharded = shard_batch(batch, mesh)
        dp_state, dp_losses = task.train_step(st, sharded, rng)

    np.testing.assert_allclose(
        float(dp_losses["total_loss"]), float(ref_losses["total_loss"]), rtol=1e-5
    )
    # updated params agree (all-reduced grads == full-batch grads)
    ref_leaf = jax.tree_util.tree_leaves(ref_state.params)[0]
    dp_leaf = jax.tree_util.tree_leaves(dp_state.params)[0]
    np.testing.assert_allclose(
        np.asarray(dp_leaf), np.asarray(ref_leaf), rtol=2e-4, atol=1e-5
    )


def test_dp_params_stay_replicated(env):
    task, fresh_state, batch, rng = env
    mesh = make_mesh(num_data=8, num_model=1)
    with mesh:
        st = jax.device_put(fresh_state(), replicate_sharding(mesh))
        sharded = shard_batch(batch, mesh)
        new_state, _ = task.train_step(st, sharded, rng)
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated
