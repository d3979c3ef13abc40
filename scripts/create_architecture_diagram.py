#!/usr/bin/env python
"""Architecture diagram with live parameter/performance stats.

Rebuild of reference create_architecture_diagram.py:6-191: draws the
camera/LiDAR/fusion/head block diagram annotated with parameter counts
computed by instantiating the actual model (not hard-coded).
"""

import argparse
import sys

sys.path.insert(0, ".")

from scripts.common import apply_env_platform


def main(argv=None):
    apply_env_platform()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fusion-type", default="concat",
                   choices=["concat", "minimal", "weighted", "gated_sum"])
    p.add_argument("--output", default="architecture_diagram.png")
    p.add_argument("--html", default=None,
                   help="also write a static HTML stats page "
                        "(reference architecture.html analog)")
    args = p.parse_args(argv)

    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

    from lmsu_tpu.config import ModelConfig
    from lmsu_tpu.models import (create_model, get_architecture_summary,
                                 init_model)

    out_ch = {"concat": 256, "minimal": 128, "weighted": 128, "gated_sum": 128}[args.fusion_type]
    cfg = ModelConfig(num_classes=2, fusion_type=args.fusion_type,
                      fusion_out_channels=out_ch)
    model = create_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0))
    s = get_architecture_summary(model, variables)

    fig, ax = plt.subplots(figsize=(13, 7))
    ax.set_xlim(0, 13)
    ax.set_ylim(0, 7)
    ax.axis("off")

    def box(x, y, w, h, title, lines, color):
        ax.add_patch(FancyBboxPatch((x, y), w, h, boxstyle="round,pad=0.08",
                                    facecolor=color, edgecolor="black",
                                    alpha=0.85))
        ax.text(x + w / 2, y + h - 0.35, title, ha="center", fontsize=11,
                weight="bold")
        for i, line in enumerate(lines):
            ax.text(x + w / 2, y + h - 0.75 - 0.33 * i, line, ha="center",
                    fontsize=9)

    def arrow(x1, y1, x2, y2):
        ax.add_patch(FancyArrowPatch((x1, y1), (x2, y2),
                                     arrowstyle="-|>", mutation_scale=18,
                                     color="black"))

    box(0.4, 4.6, 3.0, 1.9, "Camera encoder",
        ["TwinLite (MobileNetV2)", "256x256x3 -> multiscale",
         f"{s['camera_params']} params"], "#aecbfa")
    box(0.4, 0.6, 3.0, 1.9, "LiDAR encoder",
        ["PointNet MLP + scatter-max", "5000x4 -> 64x64x128",
         f"{s['lidar_params']} params"], "#ccff90")
    box(4.2, 4.6, 2.6, 1.9, "FPN-Lite",
        ["laterals s3-s5", "-> 64x64x128"], "#aecbfa")
    box(7.4, 2.6, 2.6, 1.9, f"Fusion: {args.fusion_type}",
        [f"-> 64x64x{out_ch}", f"{s['fusion_params']} params (incl. FPN)"],
        "#fff0b3")
    box(10.4, 2.6, 2.2, 1.9, "Seg head",
        ["DWSep x2 + 1x1", "-> 64x64x2", f"{s['head_params']} params"],
        "#f8bbd0")
    arrow(3.4, 5.5, 4.2, 5.5)
    arrow(6.8, 5.3, 7.6, 4.5)
    arrow(3.4, 1.5, 7.6, 2.8)
    arrow(10.0, 3.5, 10.4, 3.5)
    ax.text(6.5, 6.7, "TPU-native camera+LiDAR BEV segmentation "
            f"({args.fusion_type} fusion) — total {s['total_params']} params",
            ha="center", fontsize=13, weight="bold")

    fig.savefig(args.output, dpi=130, bbox_inches="tight")
    print(f"Wrote {args.output}")
    for k, v in s.items():
        print(f"  {k}: {v}")

    if args.html:
        rows = "\n".join(
            f"<tr><td>{k.replace('_', ' ')}</td><td>{v}</td></tr>"
            for k, v in s.items())
        html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8">
<title>TPU-native multi-modal BEV segmentation — architecture</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem; }}
 table {{ border-collapse: collapse; }}
 td {{ border: 1px solid #ccc; padding: 0.4rem 0.9rem; }}
 h1 {{ font-size: 1.3rem; }}
</style></head><body>
<h1>Camera+LiDAR BEV segmentation ({args.fusion_type} fusion)</h1>
<p>Camera: TwinLite 5-stage encoder (256&times;256&times;3 &rarr; multiscale)
 + FPN-Lite &rarr; 64&times;64&times;128.<br>
LiDAR: PointNet MLP + BEV scatter-max (5000&times;4 &rarr;
 64&times;64&times;128).<br>
Fusion &rarr; segmentation head &rarr; 64&times;64&times;2 drivable mask.</p>
<table>{rows}</table>
</body></html>"""
        with open(args.html, "w") as f:
            f.write(html)
        print(f"Wrote {args.html}")


if __name__ == "__main__":
    main()
