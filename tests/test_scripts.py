"""CLI entry-point smoke tests (subprocess, tiny configs, CPU).

The reference's entry points are bare main() scripts (SURVEY.md §2.19-2.24);
these tests pin our CLI contracts: flags parse, artifacts appear, schemas
hold. Heavier E2E behavior is covered in test_trainer/test_kd.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(args, timeout=540):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=timeout)


class TestAnalysisScripts:
    def test_analyze_distribution(self):
        r = run_script(["scripts/analyze_distribution.py",
                        "--max-samples", "5"])
        assert r.returncode == 0, r.stderr[-500:]
        assert "recommended class weights" in r.stdout
        assert "drift" in r.stdout

    def test_plot_training_curves(self, tmp_path):
        run_dir = tmp_path / "run"
        run_dir.mkdir()
        hist = {k: [0.5, 0.4] for k in
                ("train_loss", "train_miou", "val_loss", "val_miou", "lr")}
        (run_dir / "training_history.json").write_text(json.dumps(hist))
        out = tmp_path / "curves.png"
        r = run_script(["scripts/plot_training_curves.py",
                        "--runs", str(run_dir), "--output", str(out)])
        assert r.returncode == 0, r.stderr[-500:]
        assert out.exists()
        assert "best val mIoU" in r.stdout

    def test_plot_training_curves_missing_run(self, tmp_path):
        r = run_script(["scripts/plot_training_curves.py",
                        "--runs", str(tmp_path / "nope")])
        assert r.returncode == 1
        assert "No histories found" in r.stdout

    def test_architecture_diagram_with_html(self, tmp_path):
        png = tmp_path / "a.png"
        html = tmp_path / "a.html"
        r = run_script(["scripts/create_architecture_diagram.py",
                        "--output", str(png), "--html", str(html)])
        assert r.returncode == 0, r.stderr[-500:]
        assert png.exists() and html.exists()
        assert "573,442" in r.stdout  # live param count, concat default
        assert "573,442" in html.read_text()

    def test_bad_fusion_flag_rejected(self):
        r = run_script(["scripts/create_architecture_diagram.py",
                        "--fusion-type", "bogus"])
        assert r.returncode == 2
        assert "invalid choice" in r.stderr


class TestTrainDistillCLI:
    def test_width_flag_shrinks_student_not_teacher(self):
        """--width compresses the STUDENT (teacher_config scaling) while
        --teacher-width stays anchored to the reference-size model — the
        contract scripts/experiment_capacity_gap.py relies on."""
        sys.path.insert(0, REPO)
        from scripts import train_distill

        p = train_distill.make_parser()
        args = p.parse_args(["--fusion-type", "minimal",
                             "--fusion-channels", "128",
                             "--width", "0.5", "--teacher-width", "4"])
        cfg, tcfg = train_distill.build_configs(args)
        assert cfg.model.camera.width_mult == 0.5
        assert cfg.model.fusion_out_channels == 64
        assert tcfg.camera.width_mult == 4.0
        assert tcfg.fusion_out_channels == 512

        # Default --width 1.0 leaves the student at reference size.
        args = p.parse_args([])
        cfg, tcfg = train_distill.build_configs(args)
        assert cfg.model.camera.width_mult == 1.0
        assert tcfg.camera.width_mult == 2.0


class TestFeedingScripts:
    def test_prepare_dataset_and_dress_rehearsal_tiny(self, tmp_path):
        """prepare_dataset packs the synthetic fixture; dress_rehearsal
        --tiny runs the raw/cache/packed feeding comparison end-to-end on
        fabricated raw-size scenes (CPU, tiny model)."""
        out = tmp_path / "packs"
        r = run_script(["scripts/prepare_dataset.py", "--dataset",
                        "synthetic", "--num-train", "8", "--num-val", "4",
                        "--image-size", "32", "32", "--grid-size", "8", "8",
                        "--max-points", "64", "--out", str(out)])
        assert r.returncode == 0, r.stderr[-800:]
        assert (out / "train" / "meta.json").exists()
        assert (out / "val" / "image.npy").exists()

        rj = tmp_path / "dress.json"
        r = run_script(["scripts/dress_rehearsal.py", "--tiny",
                        "--frames", "48", "--epochs", "2",
                        "--batch-size", "8", "--scan-steps", "2",
                        "--points", "2000", "--out", str(rj)],
                       timeout=900)
        assert r.returncode == 0, r.stderr[-800:]
        doc = json.loads(rj.read_text())
        assert set(doc["modes"]) == {"raw", "cache", "packed", "onchip"}
        for mode, rows in doc["modes"].items():
            assert len(rows) == 2
            for row in rows:
                assert 0.0 <= row["stall_frac"] <= 1.0
                assert row["wall_s"] > 0
        # cache/packed must out-stall raw in steady state (epoch 2)
        raw2 = doc["modes"]["raw"][1]["stall_frac"]
        assert doc["modes"]["cache"][1]["stall_frac"] <= raw2
        assert doc["modes"]["packed"][1]["stall_frac"] <= raw2
