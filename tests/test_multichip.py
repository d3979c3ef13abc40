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


class _ToyDataset:
    """Tiny dict-sample dataset for input-sharding tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((2, 2, 3), i, np.float32),
                "points": np.full((5, 4), i, np.float32),
                "segmentation": np.full((4, 4), i % 2, np.int64)}


class TestMultiHostInput:
    """Per-host input sharding (SURVEY.md §2 'TPU-native equivalents',
    per-host bullet): every process computes the same global order and
    decodes a disjoint stripe; stripes concatenate to the single-host batch."""

    def test_batcher_shards_disjoint_and_cover(self):
        from lmsu_tpu.data.pipeline import Batcher
        n, B, S = 21, 8, 4  # 21 samples -> final batch padded
        full = list(Batcher(_ToyDataset(n), B, shuffle=True, seed=3))
        shards = [list(Batcher(_ToyDataset(n), B, shuffle=True, seed=3,
                               num_shards=S, shard_index=s))
                  for s in range(S)]
        assert all(len(sh) == len(full) for sh in shards)
        for step, ref in enumerate(full):
            locals_ = [shards[s][step] for s in range(S)]
            # Disjoint stripes covering the global batch, in order.
            cat_idx = np.concatenate([l["sample_index"] for l in locals_])
            np.testing.assert_array_equal(cat_idx, ref["sample_index"])
            for key in ref:
                np.testing.assert_array_equal(
                    np.concatenate([l[key] for l in locals_]), ref[key])
            # Real (non-pad) rows are claimed by exactly one shard stripe.
            assert sum(int(l["sample_mask"].sum()) for l in locals_) \
                == int(ref["sample_mask"].sum())

    def test_decode_workers_equivalent(self):
        """Threaded per-sample decode yields identical batches (order
        preserved by pool.map)."""
        from lmsu_tpu.data.pipeline import Batcher
        a = list(Batcher(_ToyDataset(19), 8, shuffle=True, seed=5))
        b = list(Batcher(_ToyDataset(19), 8, shuffle=True, seed=5,
                         decode_workers=4))
        assert len(a) == len(b)
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_stall_meter(self):
        import time

        from lmsu_tpu.utils.profiling import StallMeter

        def slow_producer():
            for i in range(3):
                time.sleep(0.02)
                yield i

        m = StallMeter(slow_producer())
        for _ in m:
            time.sleep(0.01)  # "compute"
        assert m.batches == 3
        assert 0.0 < m.stall_frac < 1.0
        assert m.wait_s >= 0.05  # ~3 x 20ms of waiting

    def test_batcher_rejects_bad_shard_config(self):
        from lmsu_tpu.data.pipeline import Batcher
        with pytest.raises(ValueError):
            Batcher(_ToyDataset(8), 6, num_shards=4)
        with pytest.raises(ValueError):
            Batcher(_ToyDataset(8), 8, num_shards=4, shard_index=4)

    def test_local_shard_slices_contiguous_disjoint(self, mesh):
        """The dim-0 index math behind make_array_from_process_local_data:
        simulate 4 processes of 2 devices each on the 8-device mesh."""
        from lmsu_tpu.parallel.mesh import local_shard_slices
        devs = list(mesh.devices.flat)
        global_shape = (16, 3)
        seen = []
        for p in range(4):
            pairs = local_shard_slices(data_sharding(mesh), global_shape,
                                       devs[2 * p:2 * p + 2])
            starts = [s.start or 0 for _, s in pairs]
            stops = [s.stop for _, s in pairs]
            # contiguous within the process
            assert stops[0] == starts[1]
            seen.append((starts[0], stops[-1]))
        # disjoint across processes and covering [0, 16)
        seen.sort()
        assert seen[0][0] == 0 and seen[-1][1] == 16
        assert all(a[1] == b[0] for a, b in zip(seen, seen[1:]))

    def test_assemble_global_batch_matches_shard_batch(self, mesh):
        """Single-process, assemble_global_batch (the explicit
        make_array_from_process_local_data path) must equal shard_batch."""
        from lmsu_tpu.parallel.mesh import assemble_global_batch
        batch = {"x": np.arange(48, dtype=np.float32).reshape(16, 3),
                 "y": np.arange(16, dtype=np.int32)}
        a = assemble_global_batch(batch, mesh)
        b = shard_batch(batch, mesh)
        for k in batch:
            assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


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
