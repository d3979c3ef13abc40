#!/usr/bin/env python
"""On-chip equivalence battery for the sorted-input MXU scatter kernel.

The CPU test suite cannot reproduce the TPU MXU's default-precision
handling of f32 matmul operands (one-pass bf16 truncation): CPU f32 dots
are exact at every precision setting. This script runs the semantics that
depend on it on the REAL chip, in one process (remote compiles are not
cached across processes on this host):

  1. f32 features at ambient DEFAULT matmul precision, production 64x64
     grid: forward must be bitwise-equal to the XLA scatter and the
     backward must match the dense VJP (this was silently broken before
     ops/scatter_sorted_pallas.py pinned per-dot `precision=`: ~1e-2 fwd
     error and near-all-zero gradients).
  2. bf16 features (the production path): bitwise fwd, matching bwd.
  3. Tie counts odd and > 256 (not bf16-representable): the cotangent
     split must still be exactly 1/N.

Exits nonzero on any mismatch. Optionally times fwd / fwd+bwd via
lax.scan (relay memoizes identical dispatches, so timing loops must chain
state).

Usage:  python scripts/verify_sorted_scatter_tpu.py [--iters 30]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=0,
                    help="scan-timed perf iterations (0 = correctness only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lmsu_tpu.ops.scatter import bev_scatter_max
    from lmsu_tpu.ops.scatter_sorted_pallas import (
        bev_scatter_max_sorted_pallas)

    backend = jax.default_backend()
    print(f"backend={backend} precision_cfg="
          f"{jax.config.jax_default_matmul_precision}")
    if backend == "cpu":
        print("WARNING: running on CPU — the precision semantics this "
              "script exists to pin are TPU-only; results are vacuous.")

    rng = np.random.default_rng(0)
    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
        if not ok:
            failures.append(name)

    # --- 1+2: production grid, f32 then bf16 --------------------------
    B, N, C, HW = 4, 3000, 64, (64, 64)
    hw = HW[0] * HW[1]
    feats32 = rng.normal(0, 1, (B, N, C)).astype(np.float32)
    idx0 = rng.integers(0, hw, (B, N)).astype(np.int32)
    valid0 = rng.uniform(size=(B, N)) > 0.3
    key = np.where(valid0, idx0, hw)
    order = np.argsort(key, axis=-1, kind="stable")
    idx = jnp.asarray(np.take_along_axis(idx0, order, axis=1))
    valid = jnp.asarray(np.take_along_axis(valid0, order, axis=1))
    feats32 = jnp.asarray(np.take_along_axis(feats32, order[..., None], 1))

    for dt in (jnp.float32, jnp.bfloat16):
        feats = feats32.astype(dt)
        a = jax.jit(lambda f: bev_scatter_max(f, idx, valid, HW))(feats)
        b = jax.jit(lambda f: bev_scatter_max_sorted_pallas(
            f, idx, valid, HW))(feats)
        eq = bool(jnp.all(a == b))
        check(f"fwd bitwise 64x64 {dt.__name__}", eq,
              f"max diff {float(jnp.max(jnp.abs((a - b).astype(jnp.float32)))):.3e}")

        ga = jax.jit(jax.grad(lambda f: jnp.sum(
            bev_scatter_max(f, idx, valid, HW).astype(jnp.float32) ** 2)))(
            feats)
        gb = jax.jit(jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(
                f, idx, valid, HW).astype(jnp.float32) ** 2)))(feats)
        gd = float(jnp.max(jnp.abs((ga - gb).astype(jnp.float32))))
        nz_a = int(jnp.sum(jnp.abs(ga.astype(jnp.float32)) > 0))
        nz_b = int(jnp.sum(jnp.abs(gb.astype(jnp.float32)) > 0))
        check(f"bwd 64x64 {dt.__name__}", gd == 0.0 and nz_a == nz_b,
              f"max diff {gd:.3e} nonzero {nz_a} vs {nz_b}")

    # --- 3: odd tie count beyond bf16's exact integer range -----------
    for dt in (jnp.float32, jnp.bfloat16):
        Bt, Nt, Ct = 1, 301, 8
        ft = jnp.ones((Bt, Nt, Ct), dt)
        it = jnp.full((Bt, Nt), 7, jnp.int32)
        vt = jnp.ones((Bt, Nt), bool)
        g = jax.jit(jax.grad(lambda f: jnp.sum(
            bev_scatter_max_sorted_pallas(
                f, it, vt, (4, 4)).astype(jnp.float32))))(ft)
        g32 = np.asarray(g, np.float32)
        want = np.asarray(jnp.full((Bt, Nt, Ct), 1 / Nt).astype(dt),
                          np.float32)
        check(f"tie count 301 {dt.__name__}",
              bool(np.allclose(g32, want, rtol=1e-6)),
              f"max {g32.max():.6f} min {g32.min():.6f} want {want[0,0,0]:.6f}")

    # --- optional perf (scan-chained: the relay memoizes) -------------
    if args.iters:
        featsb = feats32.astype(jnp.bfloat16)

        def fwd_chain(f):
            def body(c, _):
                o = bev_scatter_max_sorted_pallas(c, idx, valid, HW)
                return c + o.mean(axis=(1, 2))[:, None, :].astype(c.dtype), None
            return jax.lax.scan(body, f, None, length=args.iters)[0]

        def fwdbwd_chain(f):
            def body(c, _):
                g = jax.grad(lambda x: jnp.sum(bev_scatter_max_sorted_pallas(
                    x, idx, valid, HW).astype(jnp.float32) ** 2))(c)
                return c + 1e-6 * g.astype(c.dtype), None
            return jax.lax.scan(body, f, None, length=args.iters)[0]

        for name, fn in (("fwd", fwd_chain), ("fwd+bwd", fwdbwd_chain)):
            j = jax.jit(fn)
            t0 = time.perf_counter()
            j(featsb).block_until_ready()
            print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            j(featsb).block_until_ready()
            dt_ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(f"{name}: {dt_ms:.3f} ms/iter (bf16, B={B}, N={N}, C={C})")

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
