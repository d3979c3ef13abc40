#!/usr/bin/env python
"""Measure the int8 (w8a8) serving path vs the bf16 eval forward.

Same construction as the official bench's eval measurements (bench-shape
weighted-128 student, sorted_pallas scatter on TPU, pre-sorted fixed batch,
scan-amortized on-chip timing), both arms in ONE process (remote compiles
are per-process on this host). The int8 path quantizes the eligible 1x1
projection convolutions (ops/quant.py; models/layers.py ConvBNAct) after a
calibration pass on the measured batch.

Reports, per batch size in {32, 1}:
  * scan-amortized ms/fwd, bf16 vs int8
  * max |logit delta| relative to the bf16 logit range, and argmax
    agreement on decisively-classified pixels (|margin| > 10% of range)

Usage: python scripts/profile_quant_eval.py [--out FILE]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/quant_eval_v5e.json")
    args = ap.parse_args()

    from common import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp

    from bench import bench_shapes
    from lmsu_tpu.config import ModelConfig
    from lmsu_tpu.inference import calibrate_quant
    from lmsu_tpu.models import create_model, init_model

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    img_hw, n_pts, _ = bench_shapes(tiny=not on_tpu)

    cfg = ModelConfig(num_classes=2, fusion_type="weighted",
                      fusion_out_channels=128, compute_dtype=dtype)
    if on_tpu:
        import dataclasses
        cfg = cfg.replace(lidar=dataclasses.replace(
            cfg.lidar, scatter_impl="sorted_pallas"))
    model = create_model(cfg)
    v = init_model(model, jax.random.PRNGKey(0), batch_size=1,
                   image_size=(img_hw, img_hw), num_points=n_pts)

    rng = np.random.default_rng(7)
    B = 32
    images = rng.uniform(0, 1, (B, img_hw, img_hw, 3)).astype(np.float32)
    pts = rng.normal(0, 30, (B, n_pts, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (B, n_pts))
    if cfg.lidar.scatter_impl == "sorted_pallas":
        from lmsu_tpu.data.rasterize import bev_cell_key
        key = bev_cell_key(pts, cfg.lidar.grid_size,
                           cfg.lidar.point_cloud_range)
        order = np.argsort(key, axis=-1, kind="stable")
        pts = np.take_along_axis(pts, order[..., None], axis=1)
    images, pts = jnp.asarray(images), jnp.asarray(pts)

    qv = calibrate_quant(model, v, [{"image": images, "points": pts}])
    n_q = len(jax.tree_util.tree_leaves(qv["quant_stats"]))
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"quantized 1x1 convs: {n_q}", file=sys.stderr)

    K = 30 if on_tpu else 3

    def timed_fwd(variables, i, p):
        @jax.jit
        def fwd_k(vv, ii, pp):
            def body(x, _):
                out = model.apply(vv, ii + x * 0.0, pp, train=False)
                return jnp.mean(out.astype(jnp.float32)), 0.0
            return jax.lax.scan(body, jnp.zeros(()), None, length=K)[0]
        jax.block_until_ready(fwd_k(variables, i, p))
        t0 = time.perf_counter()
        jax.block_until_ready(fwd_k(variables, i, p))
        return (time.perf_counter() - t0) / K * 1e3

    results = {"quantized_convs": n_q, "dtype": dtype.__name__}
    for bs in (B, 1):
        ib, pb = images[:bs], pts[:bs]
        ms_base = timed_fwd(v, ib, pb)
        ms_q = timed_fwd(qv, ib, pb)
        results[f"b{bs}_ms_base"] = round(ms_base, 3)
        results[f"b{bs}_ms_int8"] = round(ms_q, 3)
        print(f"B={bs}: base {ms_base:.3f} ms  int8 {ms_q:.3f} ms "
              f"({ms_base / ms_q:.2f}x)", file=sys.stderr)

    ref = np.asarray(model.apply(v, images, pts, train=False), np.float32)
    got = np.asarray(model.apply(qv, images, pts, train=False), np.float32)
    scale = float(np.abs(ref).max())
    margin = np.abs(ref[..., 1] - ref[..., 0])
    decisive = margin > 0.1 * scale
    same = ref.argmax(-1) == got.argmax(-1)
    results["max_rel_logit_delta"] = round(
        float(np.abs(got - ref).max()) / scale, 5)
    results["decisive_argmax_agreement"] = round(
        float((same & decisive).sum() / max(decisive.sum(), 1)), 5)
    results["decisive_frac"] = round(float(decisive.mean()), 4)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
