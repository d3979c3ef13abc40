#!/usr/bin/env python
"""Measure Predictor(freeze_weights=True) vs the runtime-variables path.

VERDICT r2 next #5: the eval forward sits below the HBM roofline, so try
inference-time BN folding on the XLA path and MEASURE it. freeze_weights
closes the trained variables into the jitted program as compile-time
constants, letting XLA constant-fold each eval-mode BatchNorm's
(running_mean, running_var, scale, bias) into a single per-channel
scale/bias — and, where its algebraic simplifier allows, into the adjacent
conv weights (the fold of ops/ir_fused.py::fold_bn, done by the compiler).

Timing rules per CLAUDE.md: scan-K amortized on-chip times (the relay
memoizes byte-identical dispatches; single-call timings include ~33 ms
RTT), all executables compiled in ONE process.

Usage: python scripts/bench_frozen_predictor.py [--tiny] [--iters 20]
Writes the measured table to stdout; transcribe into docs/DESIGN.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

from bench import bench_shapes  # noqa: E402


def scan_time_eval(apply_fn, images, points, iters: int,
                   variables=None) -> float:
    """ms per forward: K data-dependent chained forwards in one dispatch.

    The carry feeds back into the input (i + x*0.0 with x = mean of the
    previous output) so XLA cannot dedupe/hoist the body and the relay sees
    one dispatch (bench.py::measure_eval_latency pattern).

    With variables=None, apply_fn(i, p) must close over its weights — they
    become compile-time constants (the freeze_weights path). Otherwise the
    variables are a runtime jit argument: apply_fn(v, i, p).
    """
    import jax
    import jax.numpy as jnp

    def body_of(v, eps):
        def body(x, _):
            i = images + x * 0.0 + eps
            out = apply_fn(i, points) if v is None \
                else apply_fn(v, i, points)
            return jnp.mean(out).astype(images.dtype), 0.0
        return body

    # eps is a runtime argument so the timed dispatch's bytes differ from
    # the warm-up dispatch (the relay memoizes identical dispatches).
    if variables is None:
        @jax.jit
        def run_k(eps):
            return jax.lax.scan(body_of(None, eps),
                                jnp.zeros((), images.dtype), None,
                                length=iters)[0]
        call = run_k
    else:
        @jax.jit
        def run_k_v(v, eps):
            return jax.lax.scan(body_of(v, eps),
                                jnp.zeros((), images.dtype), None,
                                length=iters)[0]
        call = lambda eps: run_k_v(variables, eps)  # noqa: E731

    jax.block_until_ready(call(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(call(jnp.float32(1e-6)))
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 32])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lmsu_tpu.config import ModelConfig
    from lmsu_tpu.models import create_model, init_model

    on_tpu = jax.default_backend() not in ("cpu",)
    img_hw, n_pts, _ = bench_shapes(args.tiny)
    cfg = ModelConfig(num_classes=2, fusion_type="weighted",
                      fusion_out_channels=128,
                      compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    model = create_model(cfg)
    s_vars = init_model(model, jax.random.PRNGKey(0), batch_size=1,
                        image_size=(img_hw, img_hw), num_points=n_pts)
    # Make running stats non-trivial so the fold isn't folding identities.
    s_vars = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 1 else x, s_vars)

    rng = np.random.default_rng(7)
    print(f"backend={jax.default_backend()} img={img_hw} pts={n_pts} "
          f"iters={args.iters}", file=sys.stderr)
    rows = []
    for b in args.batches:
        images = jnp.asarray(rng.uniform(0, 1, (b, img_hw, img_hw, 3)),
                             jnp.float32)
        points = jnp.asarray(rng.normal(0, 30, (b, n_pts, 4)), jnp.float32)

        def apply_runtime(v, i, p):
            return model.apply(v, i, p, train=False)

        # freeze_weights path: variables are closure constants (exactly
        # what Predictor(freeze_weights=True) jits).
        def apply_frozen(i, p):
            return model.apply(s_vars, i, p, train=False)

        ms_runtime = scan_time_eval(apply_runtime, images, points,
                                    args.iters, variables=s_vars)
        ms_frozen = scan_time_eval(apply_frozen, images, points, args.iters)
        rows.append((b, ms_runtime, ms_frozen))
        print(f"B={b:3d}: runtime-vars {ms_runtime:7.3f} ms/fwd  "
              f"frozen {ms_frozen:7.3f} ms/fwd  "
              f"delta {(ms_runtime - ms_frozen) / ms_runtime * 100:+.1f}%",
              flush=True)

    print("\n| B | runtime-vars ms | frozen ms | delta |")
    print("|---|---|---|---|")
    for b, mr, mf in rows:
        print(f"| {b} | {mr:.3f} | {mf:.3f} | "
              f"{(mr - mf) / mr * 100:+.1f}% |")


if __name__ == "__main__":
    main()
