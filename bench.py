#!/usr/bin/env python
"""Benchmark: fused camera+LiDAR KD train-step throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} to stdout.
Extra detail (eval p50 latency, config) goes to stderr.

Baseline (BASELINE.md): the reference's measured train step on this host's
CPU is 3.05 frames/s (concat, batch 4, torch eager) — and the reference has
no KD at all, so the fused KD step here does strictly more work per frame
(teacher forward + 3-term loss). North star: >=5x on one v5e chip.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_FRAMES_PER_SEC = 3.05  # BASELINE.md: measured reference train step


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from lmsu_tpu.config import (ExperimentConfig, KDConfig, ModelConfig,
                                 TrainConfig, teacher_config)
    from lmsu_tpu.models import create_model, init_model
    from lmsu_tpu.ops.losses import kd_total_loss
    from lmsu_tpu.ops.metrics import confusion_matrix
    from lmsu_tpu.training.trainer import TrainState

    on_tpu = jax.default_backend() not in ("cpu",)
    batch = 32 if on_tpu else 4
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"batch={batch} dtype={compute_dtype.__name__}", file=sys.stderr)

    student_cfg = ModelConfig(num_classes=2, fusion_type="weighted",
                              fusion_out_channels=128,
                              compute_dtype=compute_dtype)
    teacher_cfg = teacher_config(student_cfg, 2.0)
    kd = KDConfig(enabled=True, feature_taps=("camera_feat", "lidar_feat",
                                              "post_fusion"))

    student = create_model(student_cfg)
    teacher = create_model(teacher_cfg)
    s_vars = init_model(student, jax.random.PRNGKey(0), batch_size=1)
    t_vars = init_model(teacher, jax.random.PRNGKey(1), batch_size=1)

    # KD projections teacher->student per tap.
    from lmsu_tpu.training.distill import _tap_channels
    s_ch = _tap_channels(student, student_cfg)
    t_ch = _tap_channels(teacher, teacher_cfg)
    rng = jax.random.PRNGKey(2)
    projs = {}
    for tap in kd.feature_taps:
        rng, sub = jax.random.split(rng)
        projs[tap] = jax.random.normal(sub, (t_ch[tap], s_ch[tap])) / np.sqrt(
            t_ch[tap])

    tx = optax.adamw(1e-3, weight_decay=1e-3)
    params = {"model": s_vars["params"], "proj": projs}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=s_vars["batch_stats"],
                       opt_state=tx.init(params))
    class_weights = jnp.asarray([0.4, 3.5], jnp.float32)

    # Measured on v5e: the XLA loss path edges out the Pallas-fused one
    # end-to-end (775 vs 742 frames/s) — XLA fuses the feature-MSE into the
    # surrounding program well. Bench uses the faster path; the kernels stay
    # available behind KDConfig.use_pallas.
    loss_impl = kd_total_loss

    def kd_step(state, images, points, labels):
        def loss_fn(p):
            t_logits, t_feats = teacher.apply(
                t_vars, images, points, train=False,
                return_intermediates=True)
            t_logits = jax.lax.stop_gradient(t_logits)
            t_feats = jax.lax.stop_gradient(t_feats)
            (s_logits, s_feats), mut = student.apply(
                {"params": p["model"], "batch_stats": state.batch_stats},
                images, points, train=True, return_intermediates=True,
                mutable=["batch_stats"])
            loss, _ = loss_impl(
                s_logits, t_logits, s_feats, t_feats, labels,
                class_weights=class_weights, ignore_index=-1,
                temperature=kd.temperature, alpha_kl=kd.alpha_kl,
                beta_feature=kd.beta_feature, feature_taps=kd.feature_taps,
                projections=p["proj"])
            return loss, (mut["batch_stats"], s_logits)
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        cm = confusion_matrix(logits, labels, 2)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=opt_state), loss, cm

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, 256, 256, 3)),
                         jnp.float32)
    pts = rng.normal(0, 30, (batch, 5000, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (batch, 5000))
    points = jnp.asarray(pts)
    labels = jnp.asarray(rng.integers(0, 2, (batch, 64, 64)), jnp.int32)

    # K steps chained in one lax.scan: measures the step's on-chip
    # throughput. (Per-dispatch python-loop timing adds host-link overhead —
    # ~2 ms/step through this machine's TPU relay — and the relay memoizes
    # identical dispatches, so chained state is also the only *sound* way to
    # time here; see utils/profiling.py.)
    n_iters = 50 if on_tpu else 3

    def scan_step(carry, _):
        st, cm_total = carry
        st, loss, cm = kd_step(st, images, points, labels)
        return (st, cm_total + cm), loss

    @functools.partial(jax.jit, donate_argnums=0)
    def run(st):
        cm0 = jnp.zeros((2, 2), jnp.int32)
        (st, cm), losses = jax.lax.scan(scan_step, (st, cm0), None,
                                        length=n_iters)
        return st, cm, losses

    t0 = time.perf_counter()
    state, cm, losses = run(state)
    jax.block_until_ready(losses)
    print(f"compile+first {n_iters} steps: {time.perf_counter() - t0:.1f}s "
          f"loss={float(losses[-1]):.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    state, cm, losses = run(state)
    jax.block_until_ready(losses)
    step_time = (time.perf_counter() - t0) / n_iters
    frames_per_sec = batch / step_time
    print(f"kd train step: {step_time * 1e3:.2f} ms -> "
          f"{frames_per_sec:.1f} frames/s/chip", file=sys.stderr)

    # Secondary: eval p50 latency, batch 1 (reference: 80.9 ms on CPU).
    eval_fn = jax.jit(lambda v, i, p: student.apply(v, i, p, train=False))
    # Keep params on device: a device_get here would re-upload the weights on
    # every call and measure the host link instead of the chip.
    sv = {"params": state.params["model"], "batch_stats": state.batch_stats}
    i1, p1 = images[:1], points[:1]
    jax.block_until_ready(eval_fn(sv, i1, p1))
    lats = []
    for _ in range(20 if on_tpu else 3):
        t0 = time.perf_counter()
        jax.block_until_ready(eval_fn(sv, i1, p1))
        lats.append(time.perf_counter() - t0)
    print(f"eval p50 latency (B=1, incl. host link RTT): "
          f"{np.median(lats) * 1e3:.2f} ms (reference CPU: 80.9 ms)",
          file=sys.stderr)

    # On-chip eval latency: K chained forwards in one dispatch (the relay
    # RTT on this machine otherwise dominates single-call numbers).
    K = 20

    @jax.jit
    def eval_k(v, i, p):
        def body(x, _):
            out = student.apply(v, i + x * 0.0, p, train=False)
            return jnp.mean(out).astype(i.dtype), 0.0
        return jax.lax.scan(body, jnp.zeros((), i.dtype), None, length=K)[0]

    jax.block_until_ready(eval_k(sv, i1, p1))
    t0 = time.perf_counter()
    jax.block_until_ready(eval_k(sv, i1, p1))
    print(f"eval on-chip latency (B=1, scan-amortized): "
          f"{(time.perf_counter() - t0) / K * 1e3:.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "kd_train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
