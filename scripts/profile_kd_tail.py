#!/usr/bin/env python
"""Cost the non-model tail of the benched cached-teacher KD step.

The round-3 breakdown (docs/roofline_r3_sorted_breakdown.json) puts the
student fwd+bwd at 24.5 ms of the 28.9 ms headline step: a ~4.4 ms tail of
KD losses (logit KL + feature matching with learned projections), AdamW,
and the device confusion matrix. This script decomposes that tail by
ablating loss terms — same construction as the official bench
(bench.build_kd_bench, cached teacher, sorted_pallas scatter, B=32 bf16),
all in ONE process (remote compiles are per-process on this host):

  full     : CE + KL + feature matching      (the benched headline step)
  no_fm    : CE + KL                          -> delta = feature-match cost
  ce_only  : CE                               -> delta = logit-KL cost
             (ce_only still pays AdamW + confusion matrix + BN updates)

Zero-coefficient terms are statically skipped in ops/losses.py, so the
ablations genuinely remove the compute and HBM traffic.

Usage: python scripts/profile_kd_tail.py [--batch 32] [--out FILE]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="/tmp/kd_tail.json")
    args = ap.parse_args()

    from common import apply_env_platform
    apply_env_platform()

    import jax
    import jax.numpy as jnp
    from bench import build_kd_bench

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"backend={jax.default_backend()} B={args.batch}", file=sys.stderr)

    variants = [
        ("full", None, False),
        ("full_pallas_fm", None, True),  # fused Pallas feature-MSE kernel
        ("no_fm", {"feature_taps": ()}, False),
        ("ce_only", {"feature_taps": (), "alpha_kl": 0.0}, False),
    ]
    results = {}
    for name, overrides, pallas_loss in variants:
        # Off-TPU: tiny shapes (the full-size frozen teacher stalls XLA:CPU
        # constant folding for tens of minutes — see build_kd_bench) so the
        # script stays smoke-testable; numbers are only meaningful on TPU.
        run, state, data_args, n_iters, _ = build_kd_bench(
            args.batch, dtype, cached_teacher=True, tiny=not on_tpu,
            scatter_impl="sorted_pallas" if on_tpu else None,
            kd_overrides=overrides, use_pallas_loss=pallas_loss)
        t0 = time.perf_counter()
        state, cm, losses = run(state, *data_args)
        jax.block_until_ready(losses)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, cm, losses = run(state, *data_args)
        jax.block_until_ready(losses)
        ms = (time.perf_counter() - t0) / n_iters * 1e3
        print(f"{name:8s}: {ms:7.3f} ms/step (compile+warm {compile_s:.0f}s, "
              f"loss {float(losses[-1]):.4f})", file=sys.stderr)
        results[name] = round(ms, 3)

    out = {
        "batch": args.batch, "dtype": str(dtype.__name__),
        "step_ms": results,
        "feature_match_ms": round(results["full"] - results["no_fm"], 3),
        "feature_match_pallas_ms": round(
            results["full_pallas_fm"] - results["no_fm"], 3),
        "logit_kl_ms": round(results["no_fm"] - results["ce_only"], 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
