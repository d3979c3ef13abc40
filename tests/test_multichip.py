"""Multi-device (virtual 8-way CPU mesh) sharding tests.

The TPU-native answer to multi-node testing without a cluster (SURVEY.md §4):
the conftest forces 8 host devices, so these tests exercise the same
pjit/NamedSharding paths a v5e-8 slice would run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lmsu_tpu.config import MeshConfig
from lmsu_tpu.parallel.mesh import (data_sharding, make_mesh, replicate,
                                    replicated_sharding, shard_batch)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig())


class TestMesh:
    def test_eight_devices(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_submesh(self):
        m = make_mesh(MeshConfig(num_devices=4))
        assert m.devices.size == 4

    def test_batch_is_sharded_on_data_axis(self, mesh):
        batch = {"x": np.zeros((16, 4), np.float32)}
        sharded = shard_batch(batch, mesh)
        shards = sharded["x"].addressable_shards
        assert len(shards) == 8
        assert all(s.data.shape == (2, 4) for s in shards)

    def test_replicated_params(self, mesh):
        tree = {"w": np.ones((3, 3), np.float32)}
        rep = replicate(tree, mesh)
        assert all(s.data.shape == (3, 3)
                   for s in rep["w"].addressable_shards)

    def test_gradient_allreduce_semantics(self, mesh):
        """A jitted mean over a sharded batch equals the host mean — the
        collective XLA inserts is the data-parallel gradient all-reduce."""
        x = np.arange(32, dtype=np.float32).reshape(16, 2)
        xs = jax.device_put(x, data_sharding(mesh))
        f = jax.jit(lambda a: jnp.mean(a),
                    out_shardings=replicated_sharding(mesh))
        np.testing.assert_allclose(float(f(xs)), x.mean(), rtol=1e-6)

    def test_sharded_train_step_matches_single_device(self, mesh):
        """One SGD step on the 8-way mesh is numerically the step a single
        device would take on the same global batch."""
        rng = np.random.default_rng(0)
        w = np.zeros((4,), np.float32)
        x = rng.normal(size=(16, 4)).astype(np.float32)
        y = rng.normal(size=(16,)).astype(np.float32)

        def loss(w, x, y):
            return jnp.mean((x @ w - y) ** 2)

        def step(w, x, y):
            return w - 0.1 * jax.grad(loss)(w, x, y)

        w_multi = jax.jit(step, in_shardings=(replicated_sharding(mesh),
                                              data_sharding(mesh),
                                              data_sharding(mesh)),
                          out_shardings=replicated_sharding(mesh))(
            jax.device_put(w, replicated_sharding(mesh)),
            jax.device_put(x, data_sharding(mesh)),
            jax.device_put(y, data_sharding(mesh)))
        w_single = step(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(w_multi), np.asarray(w_single),
                                   rtol=1e-5)


def test_batchnorm_stats_are_global_batch(mesh):
    """Under jit + NamedSharding (GSPMD), nn.BatchNorm's reductions span the
    full global batch: the batch_stats written on an 8-way-sharded batch
    equal those a single device computes on the same full batch. This is the
    'synced BN' semantics documented in models/layers.py — no axis_name knob
    exists or is needed under this trainer."""
    from lmsu_tpu.models.layers import ConvBNAct

    rng = np.random.default_rng(3)
    x = rng.normal(1.5, 2.0, (16, 8, 8, 4)).astype(np.float32)
    block = ConvBNAct(features=4, kernel_size=(1, 1))
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]),
                           train=False)

    def apply_train(v, inp):
        _, mut = block.apply(v, inp, train=True, mutable=["batch_stats"])
        return mut["batch_stats"]

    rep = replicated_sharding(mesh)
    sharded_stats = jax.jit(apply_train, in_shardings=(rep, data_sharding(mesh)),
                            out_shardings=rep)(
        jax.device_put(variables, rep),
        jax.device_put(x, data_sharding(mesh)))
    single_stats = apply_train(variables, jnp.asarray(x))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        sharded_stats, single_stats)


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__
        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (1, 64, 64, 2)
