"""Deep-ensemble teacher (training/distill.py::EnsembleTeacher).

The ensemble presents as ONE teacher — member-averaged logits and taps —
so these tests pin (1) the averaging semantics, (2) degeneration to the
single-teacher path at K=1, (3) that the cached-teacher and tp-mesh
machinery work unchanged on an ensemble.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmsu_tpu.config import (CameraEncoderConfig, DataConfig,
                             ExperimentConfig, KDConfig, LidarEncoderConfig,
                             MeshConfig, ModelConfig, TrainConfig,
                             teacher_config)
from lmsu_tpu.data import create_datasets, make_loader
from lmsu_tpu.models import create_model, init_model
from lmsu_tpu.training.distill import DistillationTrainer, EnsembleTeacher


def _tiny_cfg(tmp_path, **kd_kw):
    kd = KDConfig(enabled=True, feature_taps=("camera_feat", "post_fusion"),
                  teacher_width_mult=2.0, **kd_kw)
    return ExperimentConfig(
        model=ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8))),
        data=DataConfig(dataset="synthetic", synthetic_num_train=8,
                        synthetic_num_val=8, image_size=(32, 32),
                        grid_size=(8, 8), max_points=128, batch_size=8),
        train=TrainConfig(num_epochs=1, class_weights=(0.4, 3.5),
                          save_dir=str(tmp_path / "kd_ens_run"), kd=kd),
    )


def _trainer(cfg, **kw):
    train_ds, val_ds = create_datasets(cfg.data)
    return DistillationTrainer(cfg, make_loader(train_ds, 8, shuffle=True),
                               make_loader(val_ds, 8, shuffle=False), **kw)


class TestEnsembleTeacherModel:
    def test_mean_logits_and_taps(self, rng):
        cfg = ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8)))
        member = create_model(cfg)
        vs = [init_model(member, jax.random.PRNGKey(i), batch_size=1,
                         image_size=(32, 32), num_points=64)
              for i in range(2)]
        img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
        pts = jnp.asarray(rng.normal(0, 20, (2, 64, 4)).astype(np.float32))
        ens = EnsembleTeacher(member, 2)
        logits, taps = ens.apply({"members": tuple(vs)}, img, pts,
                                 train=False, return_intermediates=True)
        outs = [member.apply(v, img, pts, train=False,
                             return_intermediates=True) for v in vs]
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray((outs[0][0] + outs[1][0]) / 2),
            rtol=1e-6, atol=1e-6)
        for k in taps:
            np.testing.assert_allclose(
                np.asarray(taps[k]),
                np.asarray((outs[0][1][k] + outs[1][1][k]) / 2),
                rtol=1e-6, atol=1e-6)

    def test_member_count_mismatch_raises(self):
        cfg = ModelConfig(num_classes=2, fusion_type="concat",
                          fusion_out_channels=32, camera_fpn_channels=16,
                          camera=CameraEncoderConfig(base_channels=4),
                          lidar=LidarEncoderConfig(feature_dim=16,
                                                   mlp_dims=(8, 16),
                                                   grid_size=(8, 8)))
        member = create_model(cfg)
        v = init_model(member, jax.random.PRNGKey(0), batch_size=1,
                       image_size=(32, 32), num_points=64)
        ens = EnsembleTeacher(member, 2)
        with pytest.raises(AssertionError):
            ens.apply({"members": (v,)}, jnp.zeros((1, 32, 32, 3)),
                      jnp.zeros((1, 64, 4)))


class TestEnsembleKD:
    def test_k1_ensemble_matches_single_teacher(self, tmp_path):
        """ensemble_size=1 must be the single-teacher path bit-for-bit
        (same random-teacher seed, same step program)."""
        losses = {}
        for name, kw in (("single", {}), ("k1", {"ensemble_size": 1})):
            cfg = _tiny_cfg(tmp_path / name, **kw)
            t = _trainer(cfg)
            loss, _ = t.train_epoch()
            losses[name] = float(loss)
        assert losses["single"] == losses["k1"]

    def test_k2_ensemble_trains_and_differs_from_single(self, tmp_path):
        cfg = _tiny_cfg(tmp_path, ensemble_size=2)
        t = _trainer(cfg)
        assert isinstance(t.teacher, EnsembleTeacher)
        assert len(t.teacher_variables["members"]) == 2
        loss, _ = t.train_epoch()
        assert np.isfinite(float(loss))
        single = _trainer(_tiny_cfg(tmp_path / "s"))
        loss_s, _ = single.train_epoch()
        # Different teacher target -> different KD loss.
        assert float(loss) != float(loss_s)

    def test_cached_ensemble_matches_inloop(self, tmp_path):
        cfg_a = _tiny_cfg(tmp_path, ensemble_size=2)
        cfg_b = cfg_a.replace(train=dataclasses.replace(
            cfg_a.train, kd=dataclasses.replace(cfg_a.train.kd,
                                                cache_teacher=True)))
        losses = {}
        for name, cfg in (("inloop", cfg_a), ("cached", cfg_b)):
            t = _trainer(cfg)
            loss, _ = t.train_epoch()
            losses[name] = loss
            if name == "cached":
                assert t.teacher_cache is not None
        assert losses["cached"] == pytest.approx(losses["inloop"], rel=1e-4)

    def test_ensemble_on_tp_mesh_matches_dp(self, tmp_path):
        from lmsu_tpu.parallel.mesh import make_mesh
        cfg1 = _tiny_cfg(tmp_path, ensemble_size=2)
        t1 = _trainer(cfg1)
        l1, _ = t1.train_epoch()
        cfg2 = cfg1.replace(mesh=MeshConfig(model_parallel=2))
        t2 = _trainer(cfg2, mesh=make_mesh(cfg2.mesh))
        l2, _ = t2.train_epoch()
        assert float(l1) == pytest.approx(float(l2), abs=1e-4)

    def test_checkpointed_members_load(self, tmp_path):
        """teacher_checkpoints: members from disk feed the ensemble."""
        from lmsu_tpu.training import Trainer
        from lmsu_tpu.models import count_parameters
        paths = []
        for i in range(2):
            cfg = _tiny_cfg(tmp_path / f"t{i}")
            tcfg = cfg.replace(
                model=teacher_config(cfg.model, 2.0),
                train=dataclasses.replace(
                    cfg.train, kd=KDConfig(enabled=False),
                    seed=cfg.train.seed + 1000 * i,
                    save_dir=str(tmp_path / f"teacher{i}")))
            train_ds, val_ds = create_datasets(tcfg.data)
            tr = Trainer(tcfg, make_loader(train_ds, 8, shuffle=True),
                         make_loader(val_ds, 8, shuffle=False))
            tr.train()
            paths.append(str(tmp_path / f"teacher{i}" / "best.ckpt"))
        cfg = _tiny_cfg(tmp_path, teacher_checkpoints=tuple(paths))
        t = _trainer(cfg)
        assert isinstance(t.teacher, EnsembleTeacher)
        m0, m1 = t.teacher_variables["members"]
        assert count_parameters(m0["params"]) == \
            count_parameters(m1["params"])
        # Independently-seeded members differ.
        k0 = np.asarray(jax.device_get(
            m0["params"]["camera_encoder"]["stem"]["conv"]["kernel"]))
        k1 = np.asarray(jax.device_get(
            m1["params"]["camera_encoder"]["stem"]["conv"]["kernel"]))
        assert not np.array_equal(k0, k1)
        loss, _ = t.train_epoch()
        assert np.isfinite(float(loss))
