"""Training runtime tests: E2E loop on synthetic data over the 8-device CPU
mesh, checkpoint/resume, history schema, LR schedule parity."""

import json
import os

import jax
import numpy as np
import pytest

from lmsu_tpu.config import (CameraEncoderConfig, DataConfig, ExperimentConfig,
                             LidarEncoderConfig, ModelConfig, TrainConfig)
from lmsu_tpu.data import create_datasets, make_loader
from lmsu_tpu.training import Trainer, lr_at_epoch
from lmsu_tpu.training.schedule import cosine_epoch_schedule


def _tiny_config(tmp_path, num_epochs=2, batch=8):
    return ExperimentConfig(
        model=ModelConfig(
            num_classes=2, fusion_type="concat", fusion_out_channels=32,
            camera_fpn_channels=16,
            camera=CameraEncoderConfig(base_channels=4),
            lidar=LidarEncoderConfig(feature_dim=16, mlp_dims=(8, 16),
                                     grid_size=(8, 8))),
        data=DataConfig(dataset="synthetic", synthetic_num_train=16,
                        synthetic_num_val=8, image_size=(32, 32),
                        grid_size=(8, 8), max_points=128, batch_size=batch),
        train=TrainConfig(num_epochs=num_epochs, class_weights=(0.4, 3.5),
                          save_dir=str(tmp_path / "run"), lr=3e-3),
    )


def _make_trainer(cfg):
    train_ds, val_ds = create_datasets(cfg.data)
    train_loader = make_loader(train_ds, cfg.data.batch_size, shuffle=True,
                               seed=cfg.train.seed)
    val_loader = make_loader(val_ds, cfg.data.batch_size, shuffle=False)
    return Trainer(cfg, train_loader, val_loader)


class TestTrainerE2E:
    def test_two_epoch_run_artifacts_and_learning(self, tmp_path):
        cfg = _tiny_config(tmp_path)
        trainer = _make_trainer(cfg)
        assert len(jax.devices()) == 8  # virtual mesh active
        best = trainer.train(log=lambda *a, **k: None)

        # artifacts with the reference layout
        run = cfg.train.save_dir
        assert os.path.exists(os.path.join(run, "latest.ckpt"))
        assert os.path.exists(os.path.join(run, "best.ckpt"))
        hist_path = os.path.join(run, "training_history.json")
        with open(hist_path) as f:
            hist = json.load(f)
        assert set(hist) == {"train_loss", "train_miou", "val_loss",
                             "val_miou", "lr"}
        assert all(len(v) == 2 for v in hist.values())
        # loss must fall on the learnable synthetic task
        assert hist["train_loss"][1] < hist["train_loss"][0]
        assert 0.0 <= best <= 1.0
        # history lr matches the torch post-step schedule read
        assert hist["lr"][0] == pytest.approx(
            lr_at_epoch(cfg.train.lr, cfg.train.eta_min,
                        cfg.train.num_epochs, 1))

    def test_checkpoint_resume_roundtrip(self, tmp_path):
        cfg = _tiny_config(tmp_path, num_epochs=1)
        t1 = _make_trainer(cfg)
        t1.train(log=lambda *a, **k: None)
        params_before = jax.device_get(t1.state.params)

        t2 = _make_trainer(cfg)
        start = t2.load_checkpoint(os.path.join(cfg.train.save_dir,
                                                "latest.ckpt"))
        assert start == 1
        assert t2.best_miou == t1.best_miou
        params_after = jax.device_get(t2.state.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, params_before,
                               params_after)
        assert int(jax.device_get(t2.state.step)) == int(
            jax.device_get(t1.state.step))

    def test_resume_restores_history_and_historical_best(self, tmp_path):
        """Resume must append to the prior curves (not truncate
        training_history.json) and seed best_miou from the HISTORICAL best,
        not the last epoch's value — otherwise a post-resume epoch worse
        than the true best overwrites best.ckpt."""
        cfg = _tiny_config(tmp_path, num_epochs=1)
        t1 = _make_trainer(cfg)
        t1.train(log=lambda *a, **k: None)
        hist_path = os.path.join(cfg.train.save_dir, "training_history.json")
        with open(hist_path) as f:
            hist = json.load(f)
        # Simulate a run whose recorded epoch beat the checkpointed one.
        hist["val_miou"] = [0.95]
        with open(hist_path, "w") as f:
            json.dump(hist, f)

        t2 = _make_trainer(cfg)
        start = t2.load_checkpoint(os.path.join(cfg.train.save_dir,
                                                "latest.ckpt"))
        assert start == 1
        assert t2.best_miou == 0.95          # historical max, not last epoch
        assert t2.history.history["val_miou"] == [0.95]  # curves preserved
        assert all(len(v) == 1 for v in t2.history.history.values())

    def test_scanned_epoch_matches_per_batch(self, tmp_path):
        """scan_steps>1 chains K steps in one dispatch with identical math."""
        import dataclasses
        cfg_a = _tiny_config(tmp_path, num_epochs=1)
        cfg_b = cfg_a.replace(train=dataclasses.replace(
            cfg_a.train, scan_steps=2,
            save_dir=str(tmp_path / "run_scan")))
        results = {}
        for name, cfg in (("plain", cfg_a), ("scan", cfg_b)):
            trainer = _make_trainer(cfg)
            loss, metrics = trainer.train_epoch()
            results[name] = (loss, metrics["miou"],
                             jax.device_get(trainer.state.params))
        assert results["plain"][0] == pytest.approx(results["scan"][0],
                                                    rel=1e-5)
        assert results["plain"][1] == results["scan"][1]
        # Adam normalizes by sqrt(v), so fp32 fusion-order noise on
        # near-zero gradients still moves params by up to ~lr per step;
        # bound the drift at lr x steps x margin rather than demanding
        # bitwise equality (the losses above match to 1e-5).
        lr, steps, margin = 3e-3, 2, 2.0
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                a, b, atol=lr * steps * margin),
            results["plain"][2], results["scan"][2])

    def test_scanned_eval_matches_per_batch(self, tmp_path):
        """scan_steps>1 also chains VALIDATION steps (VERDICT r2 weak #5);
        eval has no optimizer state, so losses and mIoU must match the
        per-batch path (same eval_step, state read-only). 24 val samples /
        batch 8 = 3 batches, scan_steps=2 -> one scanned chunk + a
        per-batch tail, exercising both paths."""
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, synthetic_num_val=24))
        trainer = _make_trainer(cfg)
        plain = trainer.validate()
        cfg_s = cfg.replace(train=dataclasses.replace(
            cfg.train, scan_steps=2, save_dir=str(tmp_path / "run_escan")))
        trainer_s = _make_trainer(cfg_s)
        trainer_s.state = trainer.state  # same params
        scanned = trainer_s.validate()
        assert plain[0] == pytest.approx(scanned[0], rel=1e-5)
        assert plain[1]["miou"] == pytest.approx(scanned[1]["miou"], abs=1e-7)

    def test_scanned_epoch_handles_tail(self, tmp_path):
        """Epoch length not divisible by scan_steps: tail runs per-batch."""
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, scan_steps=3))
        trainer = _make_trainer(cfg)  # 16 samples / batch 8 = 2 batches
        loss, metrics = trainer.train_epoch()
        assert np.isfinite(loss)
        assert int(jax.device_get(trainer.state.step)) == 2

    def test_onchip_epoch_matches_host_path(self, tmp_path):
        """onchip_epoch=True runs the whole epoch as one lax.scan over the
        HBM-resident train set; with shuffle off it reproduces the
        host-driven epoch's loss/metrics (same fp-reorder tolerance as the
        scan_steps test)."""
        import dataclasses
        cfg_a = _tiny_config(tmp_path, num_epochs=1)
        cfg_b = cfg_a.replace(train=dataclasses.replace(
            cfg_a.train, onchip_epoch=True,
            save_dir=str(tmp_path / "run_onchip")))
        results = {}
        for name, cfg in (("host", cfg_a), ("onchip", cfg_b)):
            train_ds, val_ds = create_datasets(cfg.data)
            trainer = Trainer(
                cfg, make_loader(train_ds, cfg.data.batch_size,
                                 shuffle=False),
                make_loader(val_ds, cfg.data.batch_size, shuffle=False))
            loss, metrics = trainer.train_epoch()
            results[name] = (loss, metrics["miou"])
        assert results["host"][0] == pytest.approx(results["onchip"][0],
                                                   rel=1e-4)
        assert results["host"][1] == pytest.approx(results["onchip"][1],
                                                   abs=1e-6)

    def test_onchip_contiguous_matches_host_path(self, tmp_path):
        """onchip_contiguous (pre-permute + contiguous slices) reproduces
        the host-driven epoch on the plain trainer too (no sliceable
        extras — the base-trainer branch of the contiguous scan)."""
        import dataclasses
        cfg_a = _tiny_config(tmp_path, num_epochs=1)
        cfg_b = cfg_a.replace(train=dataclasses.replace(
            cfg_a.train, onchip_epoch=True, onchip_contiguous=True,
            save_dir=str(tmp_path / "run_contig")))
        results = {}
        for name, cfg in (("host", cfg_a), ("contig", cfg_b)):
            train_ds, val_ds = create_datasets(cfg.data)
            trainer = Trainer(
                cfg, make_loader(train_ds, cfg.data.batch_size,
                                 shuffle=False),
                make_loader(val_ds, cfg.data.batch_size, shuffle=False))
            loss, metrics = trainer.train_epoch()
            results[name] = (loss, metrics["miou"])
        assert results["host"][0] == pytest.approx(results["contig"][0],
                                                   rel=1e-4)
        assert results["host"][1] == pytest.approx(results["contig"][1],
                                                   abs=1e-6)

    def test_onchip_eval_matches_host_path(self, tmp_path):
        """On-chip validation (one dispatch over the HBM-resident val set)
        reproduces the host-driven validate(), including a padded final
        batch (12 val samples / batch 8)."""
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, synthetic_num_val=12))
        trainer = _make_trainer(cfg)
        host = trainer.validate()
        cfg_oc = cfg.replace(train=dataclasses.replace(
            cfg.train, onchip_eval=True,
            save_dir=str(tmp_path / "run_oceval")))
        t2 = _make_trainer(cfg_oc)
        t2.state = trainer.state  # same params
        onchip = t2.validate()
        assert host[0] == pytest.approx(onchip[0], rel=1e-5)
        assert host[1]["miou"] == pytest.approx(onchip[1]["miou"], abs=1e-6)

    def test_onchip_eval_follows_onchip_epoch(self, tmp_path):
        """onchip_eval=None + onchip_epoch=True auto-runs validation
        on-chip (val data materialized); explicit True without a Batcher
        loader raises."""
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    onchip_epoch=True))
        trainer = _make_trainer(cfg)
        trainer.train_epoch()
        loss, m = trainer.validate()
        assert trainer._onchip_val_data is not None  # on-chip path taken
        assert np.isfinite(loss) and 0.0 <= m["miou"] <= 1.0

        class _NoBatcher:
            def __len__(self):
                return 1

            def __iter__(self):
                return iter(())

        cfg2 = cfg.replace(train=dataclasses.replace(
            cfg.train, onchip_epoch=False, onchip_eval=True,
            save_dir=str(tmp_path / "run_nb")))
        train_ds, val_ds = create_datasets(cfg2.data)
        from lmsu_tpu.data import make_loader
        t2 = Trainer(cfg2, make_loader(train_ds, 8, shuffle=False),
                     _NoBatcher())
        with pytest.raises(ValueError, match="onchip_eval"):
            t2.validate()

    def test_onchip_epoch_shuffles_and_learns(self, tmp_path):
        """Shuffled on-chip epochs: per-epoch permutations differ and the
        loss falls across epochs; padded tail rows stay masked."""
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=2)
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, synthetic_num_train=12),
            train=dataclasses.replace(cfg.train, onchip_epoch=True))
        trainer = _make_trainer(cfg)  # 12 samples pad to 16 (batch 8)
        best = trainer.train(log=lambda *a, **k: None)
        assert 0.0 <= best <= 1.0
        assert int(jax.device_get(trainer.state.step)) == 4  # 2 ep x 2 bat

    def test_onchip_paths_apply_sample_transform(self, tmp_path):
        """Regression (ADVICE r4 high): the on-chip epoch/val paths must
        materialize the dataset THROUGH the batcher's sample_transform.
        build_loaders attaches the cell pre-sorter for
        scatter_impl='sorted_pallas', whose ordering is a hard correctness
        contract of the sorted-scatter kernel — dropping it computed
        silently wrong loss/mIoU on-chip."""
        import dataclasses
        from lmsu_tpu.data.rasterize import make_point_sorter
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(
            model=dataclasses.replace(
                cfg.model, lidar=dataclasses.replace(
                    cfg.model.lidar, scatter_impl="sorted_pallas")))
        sorter = make_point_sorter(cfg.model.lidar.grid_size,
                                   cfg.model.lidar.point_cloud_range)
        results = {}
        for name, onchip in (("host", False), ("onchip", True)):
            c = cfg.replace(train=dataclasses.replace(
                cfg.train, onchip_epoch=onchip,
                save_dir=str(tmp_path / f"run_st_{name}")))
            train_ds, val_ds = create_datasets(c.data)
            trainer = Trainer(
                c, make_loader(train_ds, c.data.batch_size, shuffle=False,
                               sample_transform=sorter),
                make_loader(val_ds, c.data.batch_size, shuffle=False,
                            sample_transform=sorter))
            loss, metrics = trainer.train_epoch()
            vloss, vmet = trainer.validate()
            results[name] = (loss, metrics["miou"], vloss, vmet["miou"])
            if onchip:
                # The materialized copy itself must be cell-sorted: check a
                # row against the sorter applied to the raw dataset sample.
                raw = sorter(train_ds[0])
                np.testing.assert_allclose(
                    np.asarray(trainer._onchip_data["points"][0]),
                    raw["points"], rtol=1e-6)
                assert trainer._onchip_val_data is not None
        assert results["host"][0] == pytest.approx(results["onchip"][0],
                                                   rel=1e-4)
        assert results["host"][1] == pytest.approx(results["onchip"][1],
                                                   abs=1e-6)
        assert results["host"][2] == pytest.approx(results["onchip"][2],
                                                   rel=1e-4)
        assert results["host"][3] == pytest.approx(results["onchip"][3],
                                                   abs=1e-6)

    def test_eval_is_deterministic(self, tmp_path):
        cfg = _tiny_config(tmp_path, num_epochs=1)
        trainer = _make_trainer(cfg)
        l1, m1 = trainer.validate()
        l2, m2 = trainer.validate()
        assert l1 == l2 and m1["miou"] == m2["miou"]


class TestSchedule:
    def test_matches_torch_cosine_annealing(self):
        torch = pytest.importorskip("torch")
        lr0, eta_min, T = 1e-3, 1e-5, 20
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=lr0)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=T,
                                                           eta_min=eta_min)
        spe = 7
        ours = cosine_epoch_schedule(lr0, eta_min, T, spe)
        for epoch in range(T):
            torch_lr = opt.param_groups[0]["lr"]
            for s in range(spe):
                step = epoch * spe + s
                assert float(ours(step)) == pytest.approx(torch_lr, rel=1e-6)
            sched.step()


class TestEmaAndGradClip:
    """TrainConfig.ema_decay / grad_clip_norm (no reference analog — the
    reference trainer has neither; these are standard production-trainer
    features the rebuild adds)."""

    def test_grad_clip_wiring_matches_manual_clip(self):
        import jax.numpy as jnp
        import optax
        from lmsu_tpu.training.trainer import make_optimizer
        import dataclasses as dc
        from lmsu_tpu.config import TrainConfig
        tc_clip = TrainConfig(grad_clip_norm=1.0)
        tc_plain = TrainConfig()
        params = {"w": jnp.ones(4), "b": jnp.ones(2)}
        g = {"w": jnp.full(4, 100.0), "b": jnp.full(2, 50.0)}
        norm = float(optax.global_norm(g))
        g_clipped = jax.tree_util.tree_map(lambda x: x / norm, g)

        tx_c = make_optimizer(tc_clip, steps_per_epoch=1)
        tx_p = make_optimizer(tc_plain, steps_per_epoch=1)
        u_c, _ = tx_c.update(g, tx_c.init(params), params)
        u_p, _ = tx_p.update(g_clipped, tx_p.init(params), params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            u_c, u_p)

    def test_ema_recurrence_and_distinct_eval_weights(self, tmp_path):
        import dataclasses as dc
        import jax.numpy as jnp
        from lmsu_tpu.parallel.mesh import shard_batch
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dc.replace(cfg.train, ema_decay=0.5))
        trainer = _make_trainer(cfg)
        p0 = jax.device_get(trainer.state.params)
        jax.tree_util.tree_map(  # shadow initialized to params
            np.testing.assert_array_equal, p0,
            jax.device_get(trainer.state.ema_params))

        batch = next(iter(trainer.train_loader))
        state, _, _ = trainer.train_step(trainer.state,
                                         shard_batch(batch, trainer.mesh))
        p1 = jax.device_get(state.params)
        ema1 = jax.device_get(state.ema_params)
        expect = jax.tree_util.tree_map(lambda a, b: 0.5 * a + 0.5 * b,
                                        p0, p1)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
            ema1, expect)

    def test_ema_checkpoint_roundtrip_and_inference_prefers_ema(self,
                                                                tmp_path):
        import dataclasses as dc
        from lmsu_tpu.training import checkpoint as ckpt
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dc.replace(cfg.train, ema_decay=0.9))
        t1 = _make_trainer(cfg)
        t1.train(log=lambda *a, **k: None)
        ema_before = jax.device_get(t1.state.ema_params)

        t2 = _make_trainer(cfg)
        t2.load_checkpoint(os.path.join(cfg.train.save_dir, "latest.ckpt"))
        jax.tree_util.tree_map(np.testing.assert_array_equal, ema_before,
                               jax.device_get(t2.state.ema_params))

        # inference loads the EMA shadow (best-mIoU was measured with it)
        variables = ckpt.load_model_variables(
            os.path.join(cfg.train.save_dir, "latest.ckpt"))
        jax.tree_util.tree_map(np.testing.assert_array_equal, ema_before,
                               variables["params"])

    def test_pre_ema_checkpoint_formats_restore(self, tmp_path):
        """Checkpoints written before the ema_params field existed restore
        into both EMA-off (shadow None) and EMA-on (seeded) trainers."""
        import dataclasses as dc
        from flax import serialization
        cfg = _tiny_config(tmp_path, num_epochs=1)
        t1 = _make_trainer(cfg)
        t1.train(log=lambda *a, **k: None)
        path = os.path.join(cfg.train.save_dir, "latest.ckpt")
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        assert raw["state"].pop("ema_params") is None  # simulate old format
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(raw))

        t2 = _make_trainer(cfg)  # EMA off
        t2.load_checkpoint(path)
        assert t2.state.ema_params is None

        cfg_ema = cfg.replace(train=dc.replace(cfg.train, ema_decay=0.9))
        t3 = _make_trainer(cfg_ema)
        t3.load_checkpoint(path)
        jax.tree_util.tree_map(  # shadow seeded from restored params
            np.testing.assert_array_equal,
            jax.device_get(t3.state.params),
            jax.device_get(t3.state.ema_params))

    def test_kd_trainer_with_ema_and_clip(self, tmp_path):
        import dataclasses as dc
        from lmsu_tpu.config import KDConfig
        from lmsu_tpu.training.distill import DistillationTrainer
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dc.replace(
            cfg.train, ema_decay=0.9, grad_clip_norm=1.0,
            kd=KDConfig(enabled=True, teacher_width_mult=2.0)))
        train_ds, val_ds = create_datasets(cfg.data)
        trainer = DistillationTrainer(
            cfg,
            make_loader(train_ds, cfg.data.batch_size, shuffle=True,
                        seed=cfg.train.seed),
            make_loader(val_ds, cfg.data.batch_size, shuffle=False))
        best = trainer.train(log=lambda *a, **k: None)
        assert 0.0 <= best <= 1.0
        ema = jax.device_get(trainer.state.ema_params)
        assert set(ema) == {"model", "proj"}


class TestEpochAccumulator:
    """Lag-1 result draining (trainer._EpochAccumulator): conversion of a
    dispatch's results is deferred until the NEXT dispatch so the host can
    prepare chunk k+1 while the device runs chunk k."""

    def test_defers_conversion_by_one_push(self):
        import jax.numpy as jnp
        from lmsu_tpu.training.trainer import _EpochAccumulator

        acc = _EpochAccumulator()
        acc.push(jnp.float32(2.0), jnp.ones((2, 2), jnp.int32), 1)
        assert acc.n == 0 and acc.cm is None  # still in flight
        acc.push(jnp.asarray([1.0, 3.0]), 2 * jnp.ones((2, 2), jnp.int32), 2)
        assert acc.n == 1 and acc.total_loss == 2.0  # first drained
        mean_loss, cm = acc.finish(2)
        # (2.0 + 1.0 + 3.0) / 3 batches; cm summed across both pushes.
        assert mean_loss == pytest.approx(2.0)
        assert (cm == 3).all() and cm.dtype == np.int64

    def test_empty_epoch(self):
        from lmsu_tpu.training.trainer import _EpochAccumulator

        mean_loss, cm = _EpochAccumulator().finish(3)
        assert mean_loss == 0.0 and cm.shape == (3, 3) and not cm.any()

    def test_loss_parts_convert_lazily_on_read(self, tmp_path):
        import jax.numpy as jnp

        trainer = _make_trainer(_tiny_config(tmp_path, num_epochs=1))
        trainer.last_loss_parts = {"ce": jnp.float32(1.5),
                                   "kl": jnp.float32(0.25)}
        raw = trainer._last_loss_parts_raw
        assert not isinstance(next(iter(raw.values())), float)  # no sync yet
        assert trainer.last_loss_parts == {"ce": 1.5, "kl": 0.25}
        # Cached as floats after the first read.
        assert isinstance(trainer._last_loss_parts_raw["ce"], float)


class TestEvaluateScript:
    def test_evaluate_checkpoint_reproduces_best_miou(self, tmp_path):
        """scripts/evaluate.py recomputes exactly what training recorded:
        evaluating best.ckpt on the same val split returns the trainer's
        best_miou bit-for-bit (same jitted eval path, same loader)."""
        from scripts.evaluate import evaluate_checkpoint

        cfg = _tiny_config(tmp_path, num_epochs=2)
        trainer = _make_trainer(cfg)
        best = trainer.train(log=lambda *a, **k: None)

        ckpt = os.path.join(cfg.train.save_dir, "best.ckpt")
        result = evaluate_checkpoint(cfg, ckpt, split="val")
        assert result["miou"] == pytest.approx(best, abs=0.0)
        assert result["split"] == "val"
        assert len(result["class_iou"]) == cfg.model.num_classes
        # train split evaluates too (eval-mode BN, no weight updates)
        r2 = evaluate_checkpoint(cfg, ckpt, split="train")
        assert 0.0 <= r2["miou"] <= 1.0


class TestAsyncCheckpoint:
    """AsyncCheckpointer (training/checkpoint.py): background-thread writes
    with on-device snapshotting, same files/semantics as the sync path."""

    def test_files_match_sync_run(self, tmp_path):
        import dataclasses

        from lmsu_tpu.training import checkpoint as ckptlib

        cfg_s = _tiny_config(tmp_path / "s", num_epochs=2)
        _make_trainer(cfg_s).train(log=lambda *a, **k: None)
        cfg_a = _tiny_config(tmp_path / "a", num_epochs=2)
        cfg_a = cfg_a.replace(train=dataclasses.replace(
            cfg_a.train, async_checkpoint=True))
        ta = _make_trainer(cfg_a)
        ta.train(log=lambda *a, **k: None)  # train() flushes at the end
        for name in ("latest.ckpt", "best.ckpt"):
            a = ckptlib.load_checkpoint_raw(
                os.path.join(cfg_a.train.save_dir, name))
            s = ckptlib.load_checkpoint_raw(
                os.path.join(cfg_s.train.save_dir, name))
            jax.tree_util.tree_map(np.testing.assert_array_equal, a, s)

    def test_resume_from_async_run(self, tmp_path):
        import dataclasses
        cfg = _tiny_config(tmp_path, num_epochs=1)
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, async_checkpoint=True))
        t1 = _make_trainer(cfg)
        t1.train(log=lambda *a, **k: None)
        t2 = _make_trainer(cfg)
        start = t2.load_checkpoint(os.path.join(cfg.train.save_dir,
                                                "latest.ckpt"))
        assert start == 1
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               jax.device_get(t1.state.params),
                               jax.device_get(t2.state.params))

    def test_snapshot_survives_source_deletion(self, tmp_path):
        """The on-device copy decouples the write from donation: deleting
        the source buffer right after save() must not corrupt the file."""
        import jax.numpy as jnp

        from lmsu_tpu.training.checkpoint import (AsyncCheckpointer,
                                                  load_checkpoint_raw)
        ac = AsyncCheckpointer()
        x = jnp.arange(8.0)
        ac.save(str(tmp_path / "run"), {"state": {"w": x}}, 0, 0.5,
                is_best=True)
        x.delete()  # simulate the next train step consuming the donation
        ac.wait()
        for name in ("latest.ckpt", "best.ckpt"):
            raw = load_checkpoint_raw(str(tmp_path / "run" / name))
            np.testing.assert_array_equal(raw["state"]["w"],
                                          np.arange(8.0, dtype=np.float32))
            assert raw["epoch"] == 0 and raw["val_miou"] == 0.5

    def test_worker_error_is_sticky_and_recoverable(self, tmp_path):
        import jax.numpy as jnp

        from lmsu_tpu.training.checkpoint import AsyncCheckpointer
        ac = AsyncCheckpointer()
        blocker = tmp_path / "not_a_dir"
        blocker.write_text("x")  # makedirs(save_dir) will fail on this
        ac.save(str(blocker), {"state": {"w": jnp.zeros(4)}}, 0, 0.0)
        with pytest.raises(RuntimeError, match="async checkpoint"):
            ac.wait()
        # the writer thread survives the error and keeps serving
        ac.save(str(tmp_path / "ok"), {"state": {"w": jnp.ones(4)}}, 1, 0.1)
        ac.wait()
        assert os.path.exists(tmp_path / "ok" / "latest.ckpt")


class TestPreemption:
    """Graceful preemption: finish the epoch, flush checkpoints, return."""

    def test_request_preempt_stops_after_epoch(self, tmp_path):
        cfg = _tiny_config(tmp_path, num_epochs=5)
        t = _make_trainer(cfg)
        seen = []

        def log(msg=""):
            seen.append(str(msg))
            if str(msg).startswith("Epoch 2/"):
                t.request_preempt()

        t.train(log=log)
        with open(os.path.join(cfg.train.save_dir,
                               "training_history.json")) as f:
            hist = json.load(f)
        assert len(hist["val_miou"]) == 2  # epoch 2 completed, 3-5 skipped
        assert any("Preempted" in m for m in seen)
        assert not any("Training completed" in m for m in seen)
        # resume picks up at epoch 3
        t2 = _make_trainer(cfg)
        start = t2.load_checkpoint(os.path.join(cfg.train.save_dir,
                                                "latest.ckpt"))
        assert start == 2

    def test_sigterm_handler_stops_cleanly_and_restores(self, tmp_path):
        import dataclasses
        import os as _os
        import signal

        cfg = _tiny_config(tmp_path, num_epochs=4)
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    handle_sigterm=True))
        t = _make_trainer(cfg)
        prior = signal.getsignal(signal.SIGTERM)

        def log(msg=""):
            if str(msg).startswith("Epoch 1/"):
                _os.kill(_os.getpid(), signal.SIGTERM)  # delivered in-proc

        t.train(log=log)  # must NOT kill the process
        with open(os.path.join(cfg.train.save_dir,
                               "training_history.json")) as f:
            hist = json.load(f)
        assert len(hist["val_miou"]) == 1
        assert os.path.exists(os.path.join(cfg.train.save_dir,
                                           "latest.ckpt"))
        assert signal.getsignal(signal.SIGTERM) is prior  # restored


class TestSnapshots:
    """TrainConfig.snapshot_every: immutable epoch_###.ckpt files next to
    latest/best — the substrate for snapshot-ensemble teachers."""

    @pytest.mark.parametrize("use_async", [False, True])
    def test_snapshots_written_and_loadable(self, tmp_path, use_async):
        import dataclasses

        from lmsu_tpu.training import checkpoint as ckptlib

        cfg = _tiny_config(tmp_path / ("a" if use_async else "s"),
                           num_epochs=4)
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, snapshot_every=2, async_checkpoint=use_async))
        _make_trainer(cfg).train(log=lambda *a, **k: None)
        run = cfg.train.save_dir
        for n in (2, 4):
            path = os.path.join(run, f"epoch_{n:03d}.ckpt")
            assert os.path.exists(path), path
            raw = ckptlib.load_checkpoint_raw(path)
            assert raw["epoch"] == n - 1  # stored epoch is 0-based
            # snapshot is a fully valid model checkpoint
            v = ckptlib.load_model_variables(path)
            assert "params" in v and "batch_stats" in v
        for n in (1, 3):
            assert not os.path.exists(
                os.path.join(run, f"epoch_{n:03d}.ckpt"))
