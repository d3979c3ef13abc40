"""Tensor/spatial parallelism for the KD teacher (parallel/tp.py).

The reference has no distributed code (SURVEY.md §2); these tests pin the
framework's second mesh axis: a 2-D ('data', 'model') mesh where the frozen
teacher is channel-sharded (tp) or activation-H-sharded (sp) while the
student stays data-parallel. All on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lmsu_tpu.config import (CameraEncoderConfig, DataConfig,
                             ExperimentConfig, KDConfig, LidarEncoderConfig,
                             MeshConfig, ModelConfig, TrainConfig)
from lmsu_tpu.models import create_model, init_model
from lmsu_tpu.parallel.mesh import (data_sharding, make_mesh,
                                    replicated_sharding)
from lmsu_tpu.parallel.tp import (fsdp_shardings, shard_variables_fsdp,
                                  shard_variables_tp, tp_axis, tp_shardings)


@pytest.fixture(scope="module")
def mesh2d():
    return make_mesh(MeshConfig(model_parallel=2))


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ModelConfig(
        num_classes=2, fusion_type="concat", fusion_out_channels=32,
        camera_fpn_channels=16,
        camera=CameraEncoderConfig(base_channels=8),
        lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                 grid_size=(8, 8)))
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), batch_size=1,
                           image_size=(32, 32), num_points=64)
    return cfg, model, variables


def _tiny_batch(rng, B=8):
    img = jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32))
    pts = rng.normal(0, 30, (B, 64, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (B, 64))
    return img, jnp.asarray(pts)


class TestMesh2D:
    def test_shape_and_axes(self, mesh2d):
        assert mesh2d.axis_names == ("data", "model")
        assert mesh2d.shape["data"] == 4 and mesh2d.shape["model"] == 2
        assert tp_axis(mesh2d) == "model"

    def test_1d_mesh_has_no_tp_axis(self):
        assert tp_axis(make_mesh(MeshConfig())) is None

    def test_indivisible_device_count_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(model_parallel=3))

    def test_data_sharding_unchanged(self, mesh2d):
        assert data_sharding(mesh2d).spec == P("data")


class TestTPShardings:
    def test_rules(self, mesh2d, tiny_model):
        _, _, variables = tiny_model
        sh = tp_shardings(variables, mesh2d)
        p = sh["params"]
        # Conv kernel [kh,kw,Cin,Cout]: Cout sharded.
        assert p["camera_encoder"]["stem"]["conv"]["kernel"].spec == \
            P(None, None, None, "model")
        # Depthwise kernel [3,3,1,C]: C sharded.
        assert p["camera_encoder"]["stage2"]["depthwise"]["conv"][
            "kernel"].spec == P(None, None, None, "model")
        # Dense kernel [in,out]: out sharded.
        assert p["lidar_encoder"]["encoder"]["mlp1"]["kernel"].spec == \
            P(None, "model")
        # 1-D channel vectors sharded to match.
        assert p["camera_encoder"]["stem"]["bn"]["scale"].spec == P("model")
        assert sh["batch_stats"]["camera_encoder"]["stem"]["bn"][
            "mean"].spec == P("model")
        # Classifier stays replicated (KDConfig docstring rationale).
        assert p["head"]["cls"]["kernel"].spec == P()
        assert p["head"]["cls"]["bias"].spec == P()

    def test_indivisible_leaf_replicated(self, mesh2d):
        tree = {"w": jnp.zeros((4, 7))}  # 7 % 2 != 0 -> replicate
        sh = tp_shardings(tree, mesh2d)
        assert sh["w"].spec == P()

    def test_on_1d_mesh_everything_replicated(self, tiny_model):
        _, _, variables = tiny_model
        mesh = make_mesh(MeshConfig())
        sh = tp_shardings(variables, mesh)
        assert all(s.spec == P()
                   for s in jax.tree_util.tree_leaves(sh))


class TestTPForwardParity:
    def test_tp_forward_matches_replicated(self, mesh2d, tiny_model, rng):
        _, model, variables = tiny_model
        img, pts = _tiny_batch(rng)
        dsh = data_sharding(mesh2d)
        v_tp = shard_variables_tp(variables, mesh2d)
        fwd = jax.jit(
            lambda v, i, p: model.apply(v, i, p, train=False),
            in_shardings=(tp_shardings(variables, mesh2d), dsh, dsh),
            out_shardings=dsh)
        out_tp = fwd(v_tp, jax.device_put(img, dsh), jax.device_put(pts, dsh))
        out_ref = jax.jit(
            lambda v, i, p: model.apply(v, i, p, train=False))(
                variables, img, pts)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)

    def test_sp_forward_matches_replicated(self, mesh2d, tiny_model, rng):
        _, model, variables = tiny_model
        img, pts = _tiny_batch(rng)
        dsh = data_sharding(mesh2d)
        sp = NamedSharding(mesh2d, P("data", "model"))

        def fwd_sp(v, i, p):
            i = jax.lax.with_sharding_constraint(i, sp)
            return model.apply(v, i, p, train=False)

        out_sp = jax.jit(fwd_sp,
                         in_shardings=(replicated_sharding(mesh2d), dsh, dsh),
                         out_shardings=dsh)(
            variables, jax.device_put(img, dsh), jax.device_put(pts, dsh))
        out_ref = jax.jit(
            lambda v, i, p: model.apply(v, i, p, train=False))(
                variables, img, pts)
        np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)


def _kd_config(mp, teacher_partition="tp", batch=8):
    return ExperimentConfig(
        model=ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8))),
        data=DataConfig(dataset="synthetic", synthetic_num_train=batch,
                        synthetic_num_val=batch, image_size=(32, 32),
                        grid_size=(8, 8), max_points=64, batch_size=batch),
        train=TrainConfig(num_epochs=1, class_weights=(0.4, 3.5),
                          save_dir="/tmp/lmsu_tp_test",
                          kd=KDConfig(enabled=True,
                                      teacher_partition=teacher_partition,
                                      feature_taps=("camera_feat",
                                                    "post_fusion"))),
        mesh=MeshConfig(model_parallel=mp))


def _run_kd_epoch(cfg):
    from lmsu_tpu.data import SyntheticMultiModalDataset, make_loader
    from lmsu_tpu.training import DistillationTrainer
    B = cfg.data.batch_size
    ds = SyntheticMultiModalDataset(num_samples=B, image_size=(32, 32),
                                    grid_size=(8, 8), max_points=64)
    loader = make_loader(ds, B, shuffle=False)
    trainer = DistillationTrainer(cfg, loader, loader,
                                  mesh=make_mesh(cfg.mesh))
    loss, _ = trainer.train_epoch()
    val_loss, val_metrics = trainer.validate()
    return float(loss), float(val_loss), float(val_metrics["miou"])


class TestKDTrainerOnTPMesh:
    @pytest.fixture(scope="class")
    def dp_baseline(self):
        return _run_kd_epoch(_kd_config(mp=1))

    def test_tp_teacher_matches_dp(self, dp_baseline):
        l1, v1, m1 = dp_baseline
        l2, v2, m2 = _run_kd_epoch(_kd_config(mp=2, teacher_partition="tp"))
        assert abs(l1 - l2) < 1e-4, (l1, l2)
        assert abs(v1 - v2) < 1e-4, (v1, v2)
        assert m1 == pytest.approx(m2, abs=1e-6)

    def test_sp_teacher_matches_dp(self, dp_baseline):
        l1, v1, m1 = dp_baseline
        l2, v2, m2 = _run_kd_epoch(_kd_config(mp=2, teacher_partition="sp"))
        assert abs(l1 - l2) < 1e-4, (l1, l2)
        assert abs(v1 - v2) < 1e-4, (v1, v2)
        assert m1 == pytest.approx(m2, abs=1e-6)

    def test_fsdp_teacher_matches_dp(self, dp_baseline):
        # FSDP needs no model axis: the teacher's weights are storage-
        # sharded over the full 8-way DATA axis of the plain 1-D mesh.
        l1, v1, m1 = dp_baseline
        l2, v2, m2 = _run_kd_epoch(_kd_config(mp=1,
                                              teacher_partition="fsdp"))
        assert abs(l1 - l2) < 1e-4, (l1, l2)
        assert abs(v1 - v2) < 1e-4, (v1, v2)
        assert m1 == pytest.approx(m2, abs=1e-6)

    def test_unknown_partition_raises(self):
        with pytest.raises(ValueError, match="teacher_partition"):
            _run_kd_epoch(_kd_config(mp=1, teacher_partition="zp"))


class TestFSDPShardings:
    def test_largest_divisible_dim_sharded(self):
        mesh = make_mesh(MeshConfig())  # 1-D, 8 devices
        tree = {
            "conv": jnp.zeros((3, 3, 16, 32)),   # Cout=32 largest divisible
            "dense": jnp.zeros((24, 8)),          # dim0=24 largest divisible
            "vec": jnp.zeros((16,)),              # sharded
            "odd": jnp.zeros((7, 5)),             # nothing divides 8
            "scalar": jnp.zeros(()),
        }
        sh = fsdp_shardings(tree, mesh)
        assert sh["conv"].spec == P(None, None, None, "data")
        assert sh["dense"].spec == P("data", None)
        assert sh["vec"].spec == P("data")
        assert sh["odd"].spec == P()
        assert sh["scalar"].spec == P()

    def test_no_classifier_carveout(self, tiny_model):
        # Unlike TP, FSDP may slice the classifier: storage-only sharding
        # is semantically free for every leaf.
        _, _, variables = tiny_model
        sh = fsdp_shardings(variables, make_mesh(MeshConfig()))
        kern = variables["params"]["head"]["cls"]["kernel"]
        spec = sh["params"]["head"]["cls"]["kernel"].spec
        divisible = [d for d, s in enumerate(kern.shape) if s % 8 == 0]
        if divisible:
            assert spec != P()
        else:
            assert spec == P()

    def test_per_device_storage_shrinks(self, tiny_model):
        _, _, variables = tiny_model
        mesh = make_mesh(MeshConfig())
        v = shard_variables_fsdp(variables, mesh)
        for path, leaf in jax.tree_util.tree_flatten_with_path(v)[0]:
            full = int(np.prod(leaf.shape)) if leaf.shape else 1
            shard = leaf.addressable_shards[0].data.size
            if any(s % 8 == 0 and s for s in leaf.shape):
                assert shard * 8 == full, (path, leaf.shape)
            else:
                assert shard == full, (path, leaf.shape)

    def test_forward_matches_replicated(self, tiny_model, rng):
        _, model, variables = tiny_model
        mesh = make_mesh(MeshConfig())
        img, pts = _tiny_batch(rng)
        dsh = data_sharding(mesh)
        v_f = shard_variables_fsdp(variables, mesh)
        out_f = jax.jit(
            lambda v, i, p: model.apply(v, i, p, train=False),
            in_shardings=(fsdp_shardings(variables, mesh), dsh, dsh),
            out_shardings=dsh)(
            v_f, jax.device_put(img, dsh), jax.device_put(pts, dsh))
        out_ref = jax.jit(
            lambda v, i, p: model.apply(v, i, p, train=False))(
                variables, img, pts)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_ref),
                                   atol=1e-5, rtol=1e-5)
