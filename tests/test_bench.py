"""bench.py smoke test: the official metric path (the driver runs
`python bench.py` on the real chip every round) must never break silently.

Runs the COMPLETE bench main() — build, AOT compile, scan timing, cached-
teacher variant, eval latency, JSON emission — in --tiny mode on the CPU
test mesh (the full-size frozen teacher stalls XLA:CPU constant folding
for tens of minutes; tiny compiles in ~a minute)."""

import json
import sys

import pytest


def test_bench_main_tiny_emits_valid_json(capsys, monkeypatch):
    import bench

    monkeypatch.setattr(sys, "argv", ["bench.py", "--tiny", "--batch", "2"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one JSON line, got: {out}"
    rec = json.loads(out[0])
    assert rec["metric"] == "kd_train_frames_per_sec_per_chip"
    assert rec["unit"] == "frames/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == pytest.approx(
        rec["value"] / bench.BASELINE_FRAMES_PER_SEC, rel=1e-2)
    d = rec["detail"]
    assert d["tiny"] is True
    assert d["batch"] == 2
    assert d["step_ms"] > 0
    assert d["eval_p50_ms_onchip"] > 0
    # Headline = the cached-teacher step (VERDICT r2 weak #1); the in-loop
    # number is retained in detail.
    assert d["headline_variant"] == "cached_teacher"
    assert rec["value"] == d["cached_teacher_frames_per_sec"]
    assert d["in_loop_teacher_frames_per_sec"] > 0
    assert d["sweep_in_loop"] == [
        {"batch": 2,
         "frames_per_sec": pytest.approx(d["in_loop_teacher_frames_per_sec"],
                                         rel=1e-2)}]
