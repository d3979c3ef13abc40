#!/usr/bin/env python
"""Dump the optimized HLO of the camera-encoder train step and rank the
biggest tensors it materializes (the 13.4 GB/step traffic hunt).

Writes the full optimized HLO to --out and prints a by-dtype/by-shape byte
ranking of fusion/convolution outputs to stderr.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def shape_bytes(dtype: str, dims) -> int:
    size = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "s8": 1,
            "u8": 1, "f16": 2, "s64": 8}.get(dtype)
    if size is None:
        return 0
    n = 1
    for d in dims:
        n *= d
    return n * size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/camera_hlo.txt")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lmsu_tpu.config import CameraEncoderConfig
    from lmsu_tpu.models.camera_encoder import TwinLiteEncoder

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, 256, 256, 3)), jnp.float32)

    cam = TwinLiteEncoder(CameraEncoderConfig(), dtype=dtype)
    cam_vars = cam.init(jax.random.PRNGKey(0), images[:1], train=False)

    def cam_step(params):
        def loss_fn(p):
            out, _ = cam.apply(
                {"params": p, "batch_stats": cam_vars["batch_stats"]},
                images, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                       for v in out.values())
        g = jax.grad(loss_fn)(params)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-7 * b, params, g)

    compiled = jax.jit(cam_step).lower(cam_vars["params"]).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)} chars)", file=sys.stderr)

    try:
        ma = compiled.memory_analysis()
        print(f"memory: args={ma.argument_size_in_bytes/1e6:.1f}MB "
              f"out={ma.output_size_in_bytes/1e6:.1f}MB "
              f"temp={ma.temp_size_in_bytes/1e6:.1f}MB "
              f"peak temp allows estimating resident set", file=sys.stderr)
    except Exception as e:
        print(f"memory_analysis unavailable: {e}", file=sys.stderr)

    # Rank root-level instruction outputs by bytes: each named instruction
    # result that isn't inside a fused computation is materialized (HBM)
    # unless it aliases. Approximation, but finds the fat.
    pat = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(\w+)\[([\d,]*)\]"
                     r"[^=]*\s(fusion|convolution|copy|transpose|reduce|"
                     r"custom-call|all-reduce|dot|scatter|select-and-scatter)"
                     r"\(", re.M)
    per_op = collections.Counter()
    per_entry = []
    for m in pat.finditer(txt):
        name, dt, dims, op = m.groups()
        dims = [int(d) for d in dims.split(",") if d] if dims else []
        b = shape_bytes(dt, dims)
        per_op[op] += b
        per_entry.append((b, dt, dims, op, name))
    per_entry.sort(reverse=True)
    print("\nbytes by op kind:", file=sys.stderr)
    for op, b in per_op.most_common():
        print(f"  {op:20s} {b/1e9:8.3f} GB", file=sys.stderr)
    print("\ntop 40 materialized results:", file=sys.stderr)
    for b, dt, dims, op, name in per_entry[:40]:
        print(f"  {b/1e6:9.1f} MB {dt:5s}{dims} {op:12s} {name[:60]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
