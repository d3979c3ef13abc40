#!/usr/bin/env python
"""A/B probe: cached-teacher bench step with teacher tensors as closure
CONSTANTS vs jit ARGUMENTS (r5: args regressed 27.9 -> 47.5 ms at B=32 in
the sweep — this isolates it in one process, same chip state, both orders).
"""
import functools
import sys
import time

sys.path.insert(0, ".")
from scripts.common import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_kd_bench  # noqa: E402


def main():
    dtype = jnp.bfloat16
    run, state, data_args, n_iters, _ = build_kd_bench(
        32, dtype, cached_teacher=True, scatter_impl="sorted_pallas")
    images, points, labels, t_cached = data_args

    results = {}

    # A: everything as args (current bench.py)
    t0 = time.perf_counter()
    state_a, cm, losses = run(state, *data_args)
    jax.block_until_ready(losses)
    print(f"args   : compile+warm {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    state_a, cm, losses = run(state_a, *data_args)
    jax.block_until_ready(losses)
    results["args_ms"] = (time.perf_counter() - t0) / n_iters * 1e3

    # B: teacher tensors + batch as closure constants (round<=4 scheme)
    @functools.partial(jax.jit, donate_argnums=0)
    def run_const(st):
        return run.__wrapped__(st, images, points, labels, t_cached)

    t0 = time.perf_counter()
    state_b, cm, losses = run_const(state_a)
    jax.block_until_ready(losses)
    print(f"consts : compile+warm {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    state_b, cm, losses = run_const(state_b)
    jax.block_until_ready(losses)
    results["consts_ms"] = (time.perf_counter() - t0) / n_iters * 1e3

    # C: args again (order control)
    t0 = time.perf_counter()
    state_c, cm, losses = run(state_b, *data_args)
    jax.block_until_ready(losses)
    results["args2_ms"] = (time.perf_counter() - t0) / n_iters * 1e3

    for k, v in results.items():
        print(f"{k}: {v:.2f} ms/step")


if __name__ == "__main__":
    main()
