#!/usr/bin/env python
"""Per-component roofline profile of the KD train step (VERDICT r1 item 1).

For each sub-computation (student camera fwd / fwd+bwd, teacher fwd, lidar,
full student step, full KD step) this measures, at the bench configuration
(B=32, bf16, weighted fusion, KD taps camera/lidar/post_fusion):

  * scan-chained on-chip time per step (the only sound timing through this
    host's memoizing TPU relay — see utils/profiling.py),
  * XLA's own cost analysis (flops + bytes accessed) for the compiled
    executable,
  * the HBM roofline time implied by those bytes (v5e: ~819 GB/s), and the
    measured-vs-roofline ratio — i.e. how much of the step is explained by
    memory traffic XLA already schedules.

A component running AT its XLA-bytes roofline can only be improved by
*reducing traffic* (fusion that avoids materializing intermediates), not by
kernel tuning; one far off the roofline has scheduling/launch slack.

Writes JSON to --out (default /tmp/roofline.json) and a table to stderr.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HBM_GBPS = 819e9   # v5e HBM bandwidth
PEAK_FLOPS = 197e12  # v5e bf16


def _chain_scalar(tree):
    """A tiny scalar data-dependent on `tree` used to chain scan iterations
    (defeats the relay's identical-dispatch memoization)."""
    import jax
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(tree)
    s = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        s = s + jnp.sum(leaf).astype(jnp.float32) * 1e-30
    return s


def measure(name, fn, init_carry, n_iters, results):
    """Time fn (carry -> carry) chained n_iters times in one scan dispatch;
    record XLA cost analysis of the single-step executable."""
    import jax
    import jax.numpy as jnp

    # The scan donates its carry; copy so caller-owned arrays (e.g. the
    # shared cam_vars params, also closed over by later components) survive.
    init_carry = jax.tree_util.tree_map(jnp.copy, init_carry)

    @functools.partial(jax.jit, donate_argnums=0)
    def run(carry):
        def body(c, _):
            return fn(c), 0.0
        return jax.lax.scan(body, carry, None, length=n_iters)[0]

    # Cost analysis comes from the SCAN executable — remote TPU compiles
    # here cost 35-350 s each and are not cached across processes, so
    # compiling a second single-step executable per component would double
    # the wall cost. aot_compile_with_cost (shared with bench.py) applies
    # the body-counted-once rule: raw numbers ARE per-step estimates.
    from lmsu_tpu.utils.profiling import aot_compile_with_cost
    t0 = time.perf_counter()
    compiled, flops, bytes_acc = aot_compile_with_cost(run, init_carry)
    carry = compiled(init_carry)
    jax.block_until_ready(carry)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    carry = compiled(carry)
    jax.block_until_ready(carry)
    ms = (time.perf_counter() - t0) / n_iters * 1e3

    roof_ms = bytes_acc / HBM_GBPS * 1e3
    mfu = flops / (ms / 1e3) / PEAK_FLOPS if ms else 0.0
    rec = {"name": name, "ms": round(ms, 3),
           "xla_gbytes": round(bytes_acc / 1e9, 3),
           "roofline_ms": round(roof_ms, 3),
           "pct_of_roofline": round(100 * roof_ms / ms, 1) if ms else 0.0,
           "gflops": round(flops / 1e9, 2), "mfu_pct": round(100 * mfu, 2)}
    results.append(rec)
    print(f"{name:28s} {ms:8.2f} ms | XLA {bytes_acc/1e9:7.2f} GB -> "
          f"roofline {roof_ms:7.2f} ms ({rec['pct_of_roofline']:5.1f}% "
          f"explained) | {flops/1e9:7.1f} GF = {100*mfu:5.1f}% MFU "
          f"(compile {compile_s:.0f}s)", file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="/tmp/roofline.json")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of component names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lmsu_tpu.config import CameraEncoderConfig, ModelConfig, teacher_config
    from lmsu_tpu.models import create_model, init_model
    from lmsu_tpu.models.camera_encoder import TwinLiteEncoder

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch
    n = args.iters if on_tpu else 2
    print(f"backend={jax.default_backend()} B={B} dtype={dtype.__name__} "
          f"iters={n}", file=sys.stderr)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 3)), jnp.float32)
    pts = rng.normal(0, 30, (B, 5000, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (B, 5000))
    points = jnp.asarray(pts)
    labels = jnp.asarray(rng.integers(0, 2, (B, 64, 64)), jnp.int32)

    student_cfg = ModelConfig(num_classes=2, fusion_type="weighted",
                              fusion_out_channels=128, compute_dtype=dtype)
    teacher_cfg = teacher_config(student_cfg, 2.0)

    results = []
    want = set(args.only.split(",")) if args.only else None

    def enabled(name):
        return want is None or name in want

    # --- camera encoder alone (student width) ---
    cam = TwinLiteEncoder(CameraEncoderConfig(), dtype=dtype)
    cam_vars = cam.init(jax.random.PRNGKey(0), images[:1], train=False)

    if enabled("camera_fwd"):
        def cam_fwd(carry):
            out = cam.apply(cam_vars, images + carry, train=False)
            return _chain_scalar(out)
        measure("camera_fwd(eval)", cam_fwd, jnp.zeros((), jnp.float32), n,
                results)

    if enabled("camera_fwdbwd"):
        def cam_step(params):
            def loss_fn(p):
                out, _ = cam.apply(
                    {"params": p, "batch_stats": cam_vars["batch_stats"]},
                    images, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                           for v in out.values())
            g = jax.grad(loss_fn)(params)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, params, g)
        measure("camera_fwd+bwd(train)", cam_step, cam_vars["params"], n,
                results)

    if enabled("camera_fwd_fused"):
        camf = TwinLiteEncoder(CameraEncoderConfig(fused_inference=True),
                               dtype=dtype)

        def cam_fwd_fused(carry):
            out = camf.apply(cam_vars, images + carry, train=False)
            return _chain_scalar(out)
        measure("camera_fwd_fused(eval)", cam_fwd_fused,
                jnp.zeros((), jnp.float32), n, results)

    if enabled("camera_fwdbwd_fused"):
        camt = TwinLiteEncoder(CameraEncoderConfig(fused_train=True),
                               dtype=dtype)

        def cam_step_fused(params):
            def loss_fn(p):
                out, _ = camt.apply(
                    {"params": p, "batch_stats": cam_vars["batch_stats"]},
                    images, train=True, mutable=["batch_stats"])
                return sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                           for v in out.values())
            g = jax.grad(loss_fn)(params)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, params, g)
        measure("camera_fwd+bwd_fused", cam_step_fused, cam_vars["params"],
                n, results)

    # --- teacher camera (2x wide), eval mode as in the KD step ---
    tcam = TwinLiteEncoder(CameraEncoderConfig(width_mult=2.0), dtype=dtype)
    tcam_vars = tcam.init(jax.random.PRNGKey(1), images[:1], train=False)
    if enabled("teacher_camera_fwd"):
        def tcam_fwd(carry):
            out = tcam.apply(tcam_vars, images + carry, train=False)
            return _chain_scalar(out)
        measure("teacher_camera_fwd(eval)", tcam_fwd,
                jnp.zeros((), jnp.float32), n, results)

    if enabled("teacher_camera_fwd_fused"):
        tcamf = TwinLiteEncoder(
            CameraEncoderConfig(width_mult=2.0, fused_inference=True),
            dtype=dtype)

        def tcam_fwd_fused(carry):
            out = tcamf.apply(tcam_vars, images + carry, train=False)
            return _chain_scalar(out)
        measure("teacher_camera_fwd_fused", tcam_fwd_fused,
                jnp.zeros((), jnp.float32), n, results)

    # --- full models ---
    student = create_model(student_cfg)
    s_vars = init_model(student, jax.random.PRNGKey(0), batch_size=1)
    teacher = create_model(teacher_cfg)
    t_vars = init_model(teacher, jax.random.PRNGKey(1), batch_size=1)

    if enabled("teacher_full_fwd"):
        def t_fwd(carry):
            out = teacher.apply(t_vars, images + carry, points, train=False,
                                return_intermediates=True)
            return _chain_scalar(out)
        measure("teacher_full_fwd(eval)", t_fwd, jnp.zeros((), jnp.float32),
                n, results)

    if enabled("student_full_fwd"):
        def s_fwd(carry):
            out = student.apply(s_vars, images + carry, points, train=False)
            return _chain_scalar(out)
        measure("student_full_fwd(eval)", s_fwd, jnp.zeros((), jnp.float32),
                n, results)

    if enabled("student_full_fwdbwd"):
        from lmsu_tpu.ops.losses import weighted_cross_entropy
        cw = jnp.asarray([0.4, 3.5], jnp.float32)

        def s_step(params):
            def loss_fn(p):
                logits, _ = student.apply(
                    {"params": p, "batch_stats": s_vars["batch_stats"]},
                    images, points, train=True, mutable=["batch_stats"])
                return weighted_cross_entropy(logits, labels, class_weights=cw,
                                              ignore_index=-1)
            g = jax.grad(loss_fn)(params)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, params, g)
        measure("student_full_fwd+bwd", s_step, s_vars["params"], n, results)

    # --- scatter-max algorithm shootout at the bench shape ---
    from lmsu_tpu.ops.scatter import (bev_scatter_max, bev_scatter_max_sorted,
                                      points_to_bev_indices)
    pc_range = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    flat_idx, valid = points_to_bev_indices(points[..., :2], (64, 64), pc_range)
    feats_pt = jnp.asarray(
        rng.normal(size=(B, 5000, 128)), jnp.float32).astype(dtype)

    for sname, sfn in [("scatter_xla", bev_scatter_max),
                       ("scatter_sorted", bev_scatter_max_sorted)]:
        if enabled(sname):
            def sc_fwd(carry, fn=sfn):
                out = fn(feats_pt + carry, flat_idx, valid, (64, 64))
                return _chain_scalar(out)
            measure(f"{sname}_fwd", sc_fwd, jnp.zeros((), jnp.float32), n,
                    results)

            def sc_fwdbwd(carry, fn=sfn):
                g = jax.grad(lambda f: jnp.sum(
                    jnp.square(fn(f, flat_idx, valid, (64, 64))
                               .astype(jnp.float32))))(feats_pt + carry)
                return _chain_scalar(g)
            measure(f"{sname}_fwd+bwd", sc_fwdbwd, jnp.zeros((), jnp.float32),
                    n, results)

    # Sorted-input kernels: same data, pre-sorted by cell id (the production
    # contract — the pipeline's sort_by_bev_cell flag does this at decode).
    hw = 64 * 64
    key = np.where(np.asarray(valid), np.asarray(flat_idx), hw)
    order = np.argsort(key, axis=-1, kind="stable")
    feats_s = jnp.asarray(np.take_along_axis(np.asarray(feats_pt), order[..., None], 1))
    idx_s = jnp.asarray(np.take_along_axis(np.asarray(flat_idx), order, 1))
    valid_s = jnp.asarray(np.take_along_axis(np.asarray(valid), order, 1))
    from lmsu_tpu.ops.scatter_sorted_pallas import bev_scatter_max_sorted_pallas
    from lmsu_tpu.ops.voxelize_pallas import bev_scatter_max_pallas
    for sname, sfn, use_sorted in [
            ("scatter_sorted_pallas", bev_scatter_max_sorted_pallas, True),
            ("scatter_xla_sortedin", bev_scatter_max, True),
            ("scatter_pallas", bev_scatter_max_pallas, False)]:
        if enabled(sname):
            fa, ia, va = ((feats_s, idx_s, valid_s) if use_sorted
                          else (feats_pt, flat_idx, valid))

            def sc_fwd(carry, fn=sfn, fa=fa, ia=ia, va=va):
                out = fn(fa + carry, ia, va, (64, 64))
                return _chain_scalar(out)
            measure(f"{sname}_fwd", sc_fwd, jnp.zeros((), jnp.float32), n,
                    results)

            def sc_fwdbwd(carry, fn=sfn, fa=fa, ia=ia, va=va):
                g = jax.grad(lambda f: jnp.sum(
                    jnp.square(fn(f, ia, va, (64, 64))
                               .astype(jnp.float32))))(fa + carry)
                return _chain_scalar(g)
            measure(f"{sname}_fwd+bwd", sc_fwdbwd, jnp.zeros((), jnp.float32),
                    n, results)

    # --- LiDAR encoder (student width) under both scatter impls, and the
    # full student fwd+bwd under the round-3 headline config
    # (scatter_impl="sorted_pallas") — explains the benched 28.94 ms step.
    import dataclasses as _dc

    from lmsu_tpu.config import LidarEncoderConfig
    from lmsu_tpu.models.lidar_encoder import SpatialLiDAREncoder
    from lmsu_tpu.ops.losses import weighted_cross_entropy
    cw = jnp.asarray([0.4, 3.5], jnp.float32)
    # Pre-sorted points (the sorted-scatter input contract; `order` above is
    # the same cell-id key the host pipeline sorts by).
    points_s = jnp.asarray(
        np.take_along_axis(np.asarray(points), order[..., None], 1))

    for lname, impl, pin in [("lidar_fwdbwd_xla", "xla", points),
                             ("lidar_fwdbwd_sorted", "sorted_pallas",
                              points_s)]:
        if enabled(lname):
            lenc = SpatialLiDAREncoder(
                LidarEncoderConfig(scatter_impl=impl), dtype=dtype)
            l_vars = lenc.init(jax.random.PRNGKey(2), pin[:1], train=False)

            def l_step(params, lenc=lenc, l_vars=l_vars, pin=pin):
                def loss_fn(p):
                    out, _ = lenc.apply(
                        {"params": p, "batch_stats": l_vars["batch_stats"]},
                        pin, train=True, mutable=["batch_stats"])
                    return jnp.sum(jnp.square(out.astype(jnp.float32)))
                g = jax.grad(loss_fn)(params)
                return jax.tree_util.tree_map(
                    lambda a, b: a - 1e-7 * b, params, g)
            measure(lname, l_step, l_vars["params"], n, results)

    s_cfg_sorted = student_cfg.replace(
        lidar=_dc.replace(student_cfg.lidar, scatter_impl="sorted_pallas"))
    student_s = create_model(s_cfg_sorted)

    if enabled("student_fwd_sorted"):
        def s_fwd_sorted(carry):
            out = student_s.apply(s_vars, images + carry, points_s,
                                  train=False)
            return _chain_scalar(out)
        measure("student_full_fwd_sorted(eval)", s_fwd_sorted,
                jnp.zeros((), jnp.float32), n, results)

    if enabled("student_fwdbwd_sorted"):

        def s_step_sorted(params):
            def loss_fn(p):
                logits, _ = student_s.apply(
                    {"params": p, "batch_stats": s_vars["batch_stats"]},
                    images, points_s, train=True, mutable=["batch_stats"])
                return weighted_cross_entropy(logits, labels,
                                              class_weights=cw,
                                              ignore_index=-1)
            g = jax.grad(loss_fn)(params)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-7 * b, params, g)
        measure("student_full_fwd+bwd_sorted", s_step_sorted,
                s_vars["params"], n, results)

    with open(args.out, "w") as f:
        json.dump({"batch": B, "dtype": dtype.__name__, "iters": n,
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
