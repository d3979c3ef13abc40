#!/usr/bin/env python
"""Re-probe closed round-2 levers at the NEW B=128 headline (round 5).

The remat (+8% slower) and scatter-impl closures were measured at B=32
with the xla-scatter in-loop step; the cached + sorted-Pallas B=128 step
has a different byte/FLOP balance (in-loop MFU 14.4% vs 8.7%), so the
tradeoffs are re-measured rather than assumed. One process, real chip.

Arms (cached-teacher step, bf16):
  base        : sorted_pallas, no remat  (the benched headline)
  remat       : + per-stage camera remat (bytes for FLOPs)
  xla_scatter : xla scatter instead of sorted_pallas

Usage: python scripts/probe_b128_levers.py [--batch 128] [--out FILE]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, ".")
from scripts.common import apply_env_platform  # noqa: E402

apply_env_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_kd_bench  # noqa: E402


def measure(name, batch, **kw):
    run, state, data_args, n_iters, _ = build_kd_bench(
        batch, jnp.bfloat16, cached_teacher=True, **kw)
    t0 = time.perf_counter()
    state, cm, losses = run(state, *data_args)
    jax.block_until_ready(losses)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, cm, losses = run(state, *data_args)
    jax.block_until_ready(losses)
    ms = (time.perf_counter() - t0) / n_iters * 1e3
    print(f"{name:12s}: {ms:8.2f} ms/step  {batch / ms * 1e3:8.1f} f/s "
          f"(compile+warm {compile_s:.0f}s, loss {float(losses[-1]):.4f})",
          file=sys.stderr)
    return round(ms, 3)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default="/tmp/probe_b128_levers.json")
    args = ap.parse_args()

    res = {
        "base_ms": measure("base", args.batch,
                           scatter_impl="sorted_pallas"),
        "remat_ms": measure("remat", args.batch,
                            scatter_impl="sorted_pallas",
                            camera_remat=True),
        "xla_scatter_ms": measure("xla_scatter", args.batch,
                                  scatter_impl="xla"),
    }
    out = {"batch": args.batch, "variant": "cached_teacher bf16", **res}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
