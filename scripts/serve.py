#!/usr/bin/env python
"""Serve a trained model over HTTP with dynamic batching.

The production front door the reference lacks (its only inference path is
visualize_predictions.py's offline loop). Wraps lmsu_tpu.serving:
concurrent single-frame requests are micro-batched into one fixed-shape
compiled forward (see lmsu_tpu/serving/engine.py for the design).

Usage:
  # from a trainer checkpoint
  python scripts/serve.py --checkpoint checkpoints/run/best.ckpt \
      [--fusion-type weighted --fusion-channels 128] [--bf16] \
      [--batch-size 8] [--max-delay-ms 2] [--port 8765]

  # from a Predictor.export() StableHLO artifact (no model code needed)
  python scripts/serve.py --artifact student.stablehlo --batch-size 1

Client example (npz transport):
  import io, urllib.request, numpy as np
  buf = io.BytesIO(); np.savez(buf, image=img_u8, points=pts_f32)
  r = urllib.request.urlopen(urllib.request.Request(
      "http://127.0.0.1:8765/v1/predict?output=mask", data=buf.getvalue(),
      headers={"Content-Type": "application/x-npz"}))
  mask = np.load(io.BytesIO(r.read()))["mask"]
"""

import argparse
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform


def build_engine(args):
    from lmsu_tpu.serving import ServingEngine
    if args.artifact:
        return ServingEngine.from_exported(
            args.artifact, batch_size=args.batch_size,
            num_points=args.num_points,
            image_size=tuple(args.image_size),
            with_point_valid=not args.no_point_valid,
            max_delay_ms=args.max_delay_ms, max_queue=args.max_queue)
    import os

    from lmsu_tpu.config import ModelConfig
    from lmsu_tpu.inference import Predictor
    if not args.checkpoint or not os.path.exists(args.checkpoint):
        sys.exit(f"ERROR: checkpoint {args.checkpoint!r} not found. Train "
                 "one first (scripts/train_synthetic.py) or pass "
                 "--artifact <stablehlo>.")
    cfg = ModelConfig(num_classes=args.num_classes,
                      fusion_type=args.fusion_type,
                      fusion_out_channels=args.fusion_channels)
    pred = Predictor.from_checkpoint(args.checkpoint, cfg, bf16=args.bf16,
                                     freeze_weights=args.freeze_weights)
    mesh = None
    if args.data_parallel:
        import jax
        import numpy as np
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < args.data_parallel:
            sys.exit(f"ERROR: --data-parallel {args.data_parallel} but only "
                     f"{len(devs)} devices visible")
        mesh = Mesh(np.array(devs[:args.data_parallel]), ("data",))
    return ServingEngine.from_predictor(
        pred, batch_size=args.batch_size, batch_sizes=args.batch_sizes,
        image_size=tuple(args.image_size), num_points=args.num_points,
        max_delay_ms=args.max_delay_ms, mesh=mesh,
        max_queue=args.max_queue)


def main(argv=None) -> None:
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="trainer checkpoint (.ckpt)")
    src.add_argument("--artifact", help="Predictor.export() StableHLO file")
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--fusion-type", default="weighted",
                   choices=["concat", "minimal", "weighted", "gated_sum"])
    p.add_argument("--fusion-channels", type=int, default=128)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--freeze-weights", action="store_true",
                   help="bake weights into the executable (XLA folds "
                   "eval BN into convs; no hot swap)")
    p.add_argument("--batch-size", type=int, default=8,
                   help="compiled batch size; requests are micro-batched "
                   "up to this")
    p.add_argument("--batch-sizes", type=int, nargs="+", default=None,
                   metavar="B",
                   help="batch-size ladder, e.g. 1 8 32: each window is "
                   "padded to the smallest rung that fits (one compile "
                   "per rung; checkpoint backend only). Overrides "
                   "--batch-size")
    p.add_argument("--max-delay-ms", type=float, default=2.0,
                   help="batching window (max extra latency per request)")
    p.add_argument("--max-queue", type=int, default=256,
                   help="admitted-but-undispatched request bound; at the "
                   "bound requests get 503 (load shedding). 0 = unbounded")
    p.add_argument("--image-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--num-points", type=int, default=5000)
    p.add_argument("--no-point-valid", action="store_true",
                   help="artifact was exported without the mask input")
    p.add_argument("--data-parallel", type=int, default=0, metavar="N",
                   help="shard each compiled batch over the first N local "
                   "devices (checkpoint backend only; batch-size must "
                   "divide by N)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--verbose", action="store_true",
                   help="per-request access log")
    args = p.parse_args(argv)

    from lmsu_tpu.serving import make_server

    engine = build_engine(args)
    print("Compiling (one fixed-shape executable)...", flush=True)
    engine.warmup()
    server = make_server(engine, args.host, args.port, verbose=args.verbose)
    host, port = server.server_address[:2]
    print(f"Serving on http://{host}:{port}  "
          f"(batch={args.batch_size}, window={args.max_delay_ms} ms)\n"
          f"  POST /v1/predict[?output=mask]   GET /v1/stats   GET /healthz")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        engine.close()
        print("\nFinal stats:", engine.stats())


if __name__ == "__main__":
    main()
