#!/usr/bin/env python
"""Real-chip sweep of the sorted-scatter kernel's perf knobs.

Two knobs in ops/scatter_sorted_pallas.py (equivalence at every setting is
pinned by tests/test_scatter_sorted_pallas.py::TestChunkWidthAndScanVariants):

  * _CW_FWD — forward chunk width. The forward is dominated by the
    log2(cw) roll-max passes over [cw, C] vectors, so halving cw removes a
    pass AND halves the per-pass vector work per chunk (total work per
    point ~ log2(cw)); cross-chunk segments stay exact via the tile
    accumulator max.
  * _SCAN_EARLY_EXIT — per-pass lax.cond guard: a pass at distance k runs
    only if some run exceeds k (checked on the [cw,1] index column).

Everything runs in ONE process (remote TPU compiles are not cached across
processes on this host, CLAUDE.md); timings are lax.scan-chained (the relay
memoizes identical dispatches). Shapes = the bench headline: B=32, N=5000,
C=128, 64x64 grid, bf16, uniform cells, sorted input.

Usage: python scripts/sweep_sorted_scatter.py [--iters 30] [--out FILE]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="/tmp/sorted_scatter_sweep.json")
    ap.add_argument("--variants", default="256:0,256:1,128:1,64:1",
                    help="comma list of CW:EARLY[:FLAT[:TILE]] (EARLY/FLAT "
                    "0/1; FLAT = flat-chunk-table forward; TILE = output "
                    "cells per tile/one-hot width, default 128 — larger "
                    "tiles amortize the per-tile chunk loop: at TILE=512 "
                    "the 64x64 grid needs 8 tile iterations instead of 32 "
                    "and ~half the ceil-rounded chunk invocations)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import lmsu_tpu.ops.scatter_sorted_pallas as mod
    from lmsu_tpu.ops.scatter import bev_scatter_max

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    n = args.iters if jax.default_backend() != "cpu" else 2

    B, N, C, HW = 32, 5000, 128, (64, 64)
    hw = HW[0] * HW[1]
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (B, N, C)).astype(np.float32)
    idx0 = rng.integers(0, hw, (B, N)).astype(np.int32)
    valid0 = rng.uniform(size=(B, N)) > 0.1
    key = np.where(valid0, idx0, hw)
    order = np.argsort(key, axis=-1, kind="stable")
    idx = jnp.asarray(np.take_along_axis(idx0, order, axis=1))
    valid = jnp.asarray(np.take_along_axis(valid0, order, axis=1))
    featsb = jnp.asarray(np.take_along_axis(feats, order[..., None], 1)
                         ).astype(jnp.bfloat16)

    ref = jax.jit(lambda f: bev_scatter_max(f, idx, valid, HW))(featsb)

    def time_chain(fn, carry0):
        j = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(j(carry0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(j(carry0))
        return (time.perf_counter() - t0) / n * 1e3, compile_s

    defaults = (mod._FWD_FLAT, mod._TILE)
    results = []
    for spec in args.variants.split(","):
        parts = spec.split(":")
        cw_s, early_s = parts[0], parts[1]
        mod._CW_FWD = int(cw_s)
        mod._SCAN_EARLY_EXIT = bool(int(early_s))
        mod._FWD_FLAT, mod._TILE = defaults  # unset fields revert
        if len(parts) > 2:
            mod._FWD_FLAT = bool(int(parts[2]))
        if len(parts) > 3:
            mod._TILE = int(parts[3])
        tag = (f"cw{cw_s}_early{early_s}"
               f"_flat{int(mod._FWD_FLAT)}_tile{mod._TILE}")

        # bitwise correctness on-chip for this variant
        got = jax.jit(lambda f: mod.bev_scatter_max_sorted_pallas(
            f, idx, valid, HW))(featsb)
        ok = bool(jnp.all(got == ref))
        if not ok:
            print(f"{tag}: FWD MISMATCH vs XLA — skipping timing",
                  file=sys.stderr)
            results.append({"variant": tag, "correct": False})
            continue

        def fwd_chain(f):
            def body(c, _):
                o = mod.bev_scatter_max_sorted_pallas(c, idx, valid, HW)
                return c + o.mean(axis=(1, 2))[:, None, :].astype(c.dtype), None
            return jax.lax.scan(body, f, None, length=n)[0]

        def fwdbwd_chain(f):
            def body(c, _):
                g = jax.grad(lambda x: jnp.sum(
                    mod.bev_scatter_max_sorted_pallas(
                        x, idx, valid, HW).astype(jnp.float32) ** 2))(c)
                return c + 1e-6 * g.astype(c.dtype), None
            return jax.lax.scan(body, f, None, length=n)[0]

        fwd_ms, c1 = time_chain(fwd_chain, featsb)
        fb_ms, c2 = time_chain(fwdbwd_chain, featsb)
        print(f"{tag}: fwd {fwd_ms:.3f} ms  fwd+bwd {fb_ms:.3f} ms  "
              f"(compiles {c1:.0f}s/{c2:.0f}s)", file=sys.stderr)
        results.append({"variant": tag, "cw_fwd": int(cw_s),
                        "early_exit": bool(int(early_s)),
                        "tile": mod._TILE, "correct": True,
                        "fwd_ms": round(fwd_ms, 3),
                        "fwdbwd_ms": round(fb_ms, 3)})

    out = {"batch": B, "n_points": N, "channels": C, "grid": HW,
           "dtype": "bfloat16", "iters": n, "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
