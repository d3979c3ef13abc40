"""Teacher->student knowledge distillation trainer.

The reference repo is *named* for knowledge distillation but ships none
(SURVEY.md §0): its only KD machinery is the intermediates tap on the model
forward (fusion_module.py:260-262).  This module supplies the missing
subsystem, demanded by the north star:

  loss = CE(student, labels)
       + alpha * T^2 * KL(teacher || student)        (logit distillation)
       + beta  * mean_t MSE(student_t, proj_t(teacher_t))  (feature matching)

  * teacher = a width-multiplied variant of the same architecture
    (config.teacher_config) or any checkpoint-loaded model;
  * feature taps come from the intermediates contract: camera_feat /
    lidar_feat / pre_fusion / post_fusion;
  * per-tap learned [Ct, Cs] projections map teacher channels down to
    student channels; they train jointly with the student;
  * the teacher forward runs inside the same jitted step under
    stop_gradient — one XLA program for the whole fused KD train step;
  * KDConfig.use_pallas routes the loss through the fused Pallas kernel
    (ops/kd_loss_pallas.py) on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lmsu_tpu.config import ExperimentConfig, ModelConfig, teacher_config
from lmsu_tpu.models import create_model, init_model
from lmsu_tpu.ops.losses import kd_total_loss
from lmsu_tpu.ops.metrics import confusion_matrix
from lmsu_tpu.parallel.mesh import (data_sharding, replicate,
                                    replicated_sharding)
from lmsu_tpu.training.trainer import Trainer, TrainState


def _tap_channels(model, config: ModelConfig) -> Dict[str, int]:
    """Channel widths of each KD tap for a given model config."""
    if config.camera.return_multiscale:
        cam = config.camera_fpn_channels
    else:  # camera_feat is the raw stage5 output (fusion_module.py:236)
        cam = config.camera.channels[2]
    lidar = config.lidar.feature_dim
    if config.fusion_type == "concat":
        pre = cam + lidar
        post = config.fusion_out_channels
    else:
        pre = post = cam
    return {"camera_feat": cam, "lidar_feat": lidar,
            "pre_fusion": pre, "post_fusion": post,
            "logits": config.num_classes}


class DistillationTrainer(Trainer):
    """Trainer whose train step distills from a frozen teacher."""

    def __init__(self, config: ExperimentConfig, train_loader, val_loader,
                 mesh=None, teacher_variables=None,
                 teacher_model_config: Optional[ModelConfig] = None):
        self.kd = config.train.kd
        self.teacher_config = teacher_model_config or teacher_config(
            config.model, self.kd.teacher_width_mult)
        self.teacher = create_model(self.teacher_config)
        self._teacher_vars_init = teacher_variables
        super().__init__(config, train_loader, val_loader, mesh=mesh)

    # -- state construction -------------------------------------------------

    def _init_teacher(self):
        if self._teacher_vars_init is not None:
            return self._teacher_vars_init
        if self.kd.teacher_checkpoint:
            from lmsu_tpu.training import checkpoint as ckptlib
            return ckptlib.load_model_variables(self.kd.teacher_checkpoint)
        # Fallback: randomly initialized teacher (useful for tests/benches;
        # real runs should pass a trained teacher).
        rng = jax.random.PRNGKey(self.config.train.seed + 1)
        return init_model(self.teacher, rng,
                          image_size=self.config.data.image_size,
                          num_points=self.config.data.max_points)

    def _init_projections(self) -> Dict[str, jnp.ndarray]:
        s_ch = _tap_channels(self.model, self.config.model)
        t_ch = _tap_channels(self.teacher, self.teacher_config)
        rng = jax.random.PRNGKey(self.config.train.seed + 2)
        projs = {}
        for tap in self.kd.feature_taps:
            ct, cs = t_ch[tap], s_ch[tap]
            rng, sub = jax.random.split(rng)
            projs[tap] = jax.random.normal(sub, (ct, cs)) / np.sqrt(ct)
        return projs

    def _build_steps(self) -> None:
        # Rebuild state with KD projections folded into the trainable params.
        self.teacher_variables = replicate(self._init_teacher(), self.mesh)
        base = jax.device_get(self.state)
        params = {"model": base.params, "proj": self._init_projections()}
        state = TrainState(step=base.step, params=params,
                           batch_stats=base.batch_stats,
                           opt_state=self.tx.init(params))
        self.state = replicate(state, self.mesh)

        rep = replicated_sharding(self.mesh)
        dsh = data_sharding(self.mesh)
        kd = self.kd
        ignore_index = self.config.train.ignore_index
        metrics_classes = self.config.train.metrics_num_classes

        def kd_loss_fn(params, batch_stats, batch):
            kwargs = {}
            if "point_valid" in batch:
                kwargs["point_valid"] = batch["point_valid"]
            t_logits, t_feats = self.teacher.apply(
                self.teacher_variables, batch["image"], batch["points"],
                train=False, return_intermediates=True, **kwargs)
            t_logits = jax.lax.stop_gradient(t_logits)
            t_feats = jax.lax.stop_gradient(t_feats)
            (s_logits, s_feats), mut = self.model.apply(
                {"params": params["model"], "batch_stats": batch_stats},
                batch["image"], batch["points"], train=True,
                return_intermediates=True, mutable=["batch_stats"], **kwargs)
            if kd.use_pallas:
                from lmsu_tpu.ops.kd_loss_pallas import kd_total_loss_fused
                loss_impl = kd_total_loss_fused
            else:
                loss_impl = kd_total_loss
            loss, parts = loss_impl(
                s_logits, t_logits, s_feats, t_feats,
                batch["segmentation"], class_weights=self.class_weights,
                ignore_index=ignore_index, temperature=kd.temperature,
                alpha_kl=kd.alpha_kl, beta_feature=kd.beta_feature,
                feature_taps=kd.feature_taps, projections=params["proj"],
                sample_weight=batch.get("sample_mask"))
            cm = confusion_matrix(s_logits, batch["segmentation"],
                                  metrics_classes, ignore_index)
            return loss, (mut["batch_stats"], cm, parts)

        def train_step(state: TrainState, batch):
            (loss, (new_stats, cm, parts)), grads = jax.value_and_grad(
                kd_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                          batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      batch_stats=new_stats,
                                      opt_state=opt_state)
            return new_state, loss, cm, parts

        def eval_step(state: TrainState, batch):
            loss, (_, _, cm) = self._loss_and_metrics(
                state.params["model"], state.batch_stats, batch, train=False)
            return loss, cm

        self.train_step_kd = jax.jit(train_step, in_shardings=(rep, dsh),
                                     out_shardings=(rep, rep, rep, rep),
                                     donate_argnums=0)
        self.eval_step = jax.jit(eval_step, in_shardings=(rep, dsh),
                                 out_shardings=(rep, rep))
        self.last_loss_parts: Dict[str, float] = {}

        # -- frozen-teacher output cache (KDConfig.cache_teacher) ----------
        self.teacher_cache = None

        def fill_cache(cache, batch):
            kwargs = {}
            if "point_valid" in batch:
                kwargs["point_valid"] = batch["point_valid"]
            t_logits, t_feats = self.teacher.apply(
                self.teacher_variables, batch["image"], batch["points"],
                train=False, return_intermediates=True, **kwargs)
            idx = batch["sample_index"]
            cache = dict(cache)
            cache["logits"] = cache["logits"].at[idx].set(
                t_logits.astype(cache["logits"].dtype))
            for tap in kd.feature_taps:
                cache[tap] = cache[tap].at[idx].set(
                    t_feats[tap].astype(cache[tap].dtype))
            return cache

        def train_step_cached(state: TrainState, batch, cache):
            idx = batch["sample_index"]
            t_logits = jnp.take(cache["logits"], idx, axis=0)
            t_feats = {tap: jnp.take(cache[tap], idx, axis=0)
                       for tap in kd.feature_taps}

            def loss_fn(params, batch_stats):
                kwargs = {}
                if "point_valid" in batch:
                    kwargs["point_valid"] = batch["point_valid"]
                (s_logits, s_feats), mut = self.model.apply(
                    {"params": params["model"], "batch_stats": batch_stats},
                    batch["image"], batch["points"], train=True,
                    return_intermediates=True, mutable=["batch_stats"],
                    **kwargs)
                loss_fn_impl = kd_total_loss
                if kd.use_pallas:
                    from lmsu_tpu.ops.kd_loss_pallas import kd_total_loss_fused
                    loss_fn_impl = kd_total_loss_fused
                loss, parts = loss_fn_impl(
                    s_logits, t_logits, s_feats, t_feats,
                    batch["segmentation"], class_weights=self.class_weights,
                    ignore_index=ignore_index, temperature=kd.temperature,
                    alpha_kl=kd.alpha_kl, beta_feature=kd.beta_feature,
                    feature_taps=kd.feature_taps,
                    projections=params["proj"],
                    sample_weight=batch.get("sample_mask"))
                cm = confusion_matrix(s_logits, batch["segmentation"],
                                      metrics_classes, ignore_index)
                return loss, (mut["batch_stats"], cm, parts)

            (loss, (new_stats, cm, parts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      batch_stats=new_stats,
                                      opt_state=opt_state)
            return new_state, loss, cm, parts

        self.fill_cache_step = jax.jit(fill_cache, donate_argnums=0)
        self.train_step_kd_cached = jax.jit(train_step_cached,
                                            donate_argnums=0)

        # K chained KD steps per dispatch (TrainConfig.scan_steps), for both
        # the in-loop-teacher and cached-teacher variants.
        def _scan_over(step_fn, extra=()):
            def scanned(state: TrainState, batches, *args):
                def body(st, batch):
                    st, loss, cm, parts = step_fn(st, batch, *args)
                    return st, (loss, cm, parts)
                state, (losses, cms, parts) = jax.lax.scan(body, state,
                                                           batches)
                last_parts = jax.tree_util.tree_map(lambda x: x[-1], parts)
                return state, losses, jnp.sum(cms, axis=0), last_parts
            return jax.jit(scanned,
                           in_shardings=(rep, self._scan_sharding) + extra,
                           out_shardings=(rep, rep, rep, rep),
                           donate_argnums=0)

        self.train_scan_kd = _scan_over(train_step)
        self.train_scan_kd_cached = _scan_over(train_step_cached, (rep,))

    def _tap_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.config.model.compute_dtype == jnp.bfloat16 \
            else jnp.float32

    def _build_teacher_cache(self) -> None:
        """One teacher pass over the training set into HBM-resident arrays."""
        from lmsu_tpu.parallel.mesh import shard_batch
        n = len(self.train_loader.batcher.dataset) \
            if hasattr(self.train_loader, "batcher") else None
        if n is None:
            raise ValueError("cache_teacher requires a Batcher-based loader")
        # Infer exact tap/logit shapes from the teacher itself — robust to
        # output_mode, FPN stage choices, and non-square images.
        ih, iw = self.config.data.image_size
        img_spec = jax.ShapeDtypeStruct((1, ih, iw, 3), jnp.float32)
        pts_spec = jax.ShapeDtypeStruct(
            (1, self.config.data.max_points,
             self.config.model.lidar.input_dim), jnp.float32)
        logits_s, feats_s = jax.eval_shape(
            lambda i, p: self.teacher.apply(
                self.teacher_variables, i, p, train=False,
                return_intermediates=True), img_spec, pts_spec)
        dt = self._tap_dtype()
        cache = {"logits": jnp.zeros((n,) + logits_s.shape[1:], dt)}
        for tap in self.kd.feature_taps:
            cache[tap] = jnp.zeros((n,) + feats_s[tap].shape[1:], dt)
        # Cache entries are keyed by sample index, so any epoch order works.
        for batch in self.train_loader:
            batch = shard_batch(batch, self.mesh)
            cache = self.fill_cache_step(cache, batch)
        self.teacher_cache = cache

    def _run_epoch(self, loader, train: bool):
        from lmsu_tpu.ops.metrics import iou_from_confusion
        from lmsu_tpu.parallel.mesh import shard_batch
        if train and self.kd.cache_teacher and self.teacher_cache is None:
            self._build_teacher_cache()
        K = self.config.train.scan_steps
        if train and K > 1:
            return self._run_epoch_scanned_kd(loader, K)
        total_loss, n = 0.0, 0
        cm_total = np.zeros((self.config.train.metrics_num_classes,) * 2,
                            np.int64)
        for batch in loader:
            batch = shard_batch(batch, self.mesh)
            if train and self.teacher_cache is not None:
                self.state, loss, cm, parts = self.train_step_kd_cached(
                    self.state, batch, self.teacher_cache)
                self.last_loss_parts = {k: float(v) for k, v in parts.items()}
            elif train:
                self.state, loss, cm, parts = self.train_step_kd(self.state,
                                                                 batch)
                self.last_loss_parts = {k: float(v) for k, v in parts.items()}
            else:
                loss, cm = self.eval_step(self.state, batch)
            total_loss += float(loss)
            cm_total += np.asarray(cm, np.int64)
            n += 1
        return total_loss / max(n, 1), iou_from_confusion(cm_total)

    def _run_epoch_scanned_kd(self, loader, K: int):
        cached = self.teacher_cache is not None

        def scan_call(stacked):
            if cached:
                self.state, losses, cm, parts = self.train_scan_kd_cached(
                    self.state, stacked, self.teacher_cache)
            else:
                self.state, losses, cm, parts = self.train_scan_kd(
                    self.state, stacked)
            self.last_loss_parts = {k: float(v) for k, v in parts.items()}
            return losses, cm

        def step_call(batch):
            if cached:
                self.state, loss, cm, parts = self.train_step_kd_cached(
                    self.state, batch, self.teacher_cache)
            else:
                self.state, loss, cm, parts = self.train_step_kd(self.state,
                                                                 batch)
            self.last_loss_parts = {k: float(v) for k, v in parts.items()}
            return loss, cm

        return self._run_epoch_chunks(loader, K, scan_call, step_call)
