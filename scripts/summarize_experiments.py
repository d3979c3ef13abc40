#!/usr/bin/env python
"""Collate every committed experiment/measurement artifact into RESULTS.md.

One deterministic, regenerable report over the JSON artifacts the training
and profiling scripts write (each table cites its source artifact and the
script that produced it). Run from the repo root:

    python scripts/summarize_experiments.py          # rewrites RESULTS.md
    python scripts/summarize_experiments.py --stdout

The reference repo publishes results only as scattered JSONs and hardcoded
figures (fusion_ablation_results.json, architecture.html stats); this is
the consolidated equivalent for the TPU rebuild.
"""

import argparse
import json
import os
import sys


def load(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def pct(x, nd=1):
    return f"{100.0 * x:.{nd}f}"


def f4(x):
    return f"{x:.4f}"


def section_kd_lift(out):
    d = load("kd_comparison_results.json")
    if not d:
        return
    cfg = d["config"]
    out.append(
        "## Knowledge distillation: 3-way comparison (hard synthetic "
        "benchmark)\n\n"
        f"`kd_comparison_results.json` — scripts/experiment_kd_lift.py; "
        f"{cfg['num_train']} train / {cfg['num_val']} val frames, "
        f"{cfg['epochs']} epochs, B={cfg['batch_size']}, "
        f"{cfg['teacher_width']}x-wide teacher, T={cfg['temperature']}, "
        f"alpha={cfg['alpha_kl']}, beta={cfg['beta_feature']}. Arms share "
        "each seed's data order/init, so the KD effect is the paired "
        "per-seed gap.\n")
    out.append("| seed | teacher | student | student+KD | paired KD gap |")
    out.append("|---|---|---|---|---|")
    gaps = []
    for s, row in sorted(d["per_seed"].items()):
        gap = row["student_kd"] - row["student"]
        gaps.append(gap)
        out.append(f"| {s} | {f4(row['teacher'])} | {f4(row['student'])} | "
                   f"{f4(row['student_kd'])} | **+{pct(gap)} pt** |")
    n = len(gaps)
    out.append(
        f"\nPaired gap positive on **all {n} seeds**: mean "
        f"+{pct(sum(gaps) / n)} pt, min +{pct(min(gaps))} pt. Mean mIoU "
        "teacher "
        f"{f4(sum(r['teacher'] for r in d['per_seed'].values()) / n)} / "
        "student+KD "
        f"{f4(sum(r['student_kd'] for r in d['per_seed'].values()) / n)} / "
        "student "
        f"{f4(sum(r['student'] for r in d['per_seed'].values()) / n)}. "
        "(Seed 3's student collapses to 0.70 — a hard-seed outlier; KD "
        "improves it but does not rescue it, reported as-is.)\n")
    eq = load("kd_cache_equiv.json")
    if eq:
        out.append(
            "Cached-teacher equivalence (`kd_cache_equiv.json`, round-4 "
            f"rerun — the genuine comparison; the r3 artifact's |diff|=0 "
            f"was vacuous, see the script docstring): paired 40-epoch "
            f"seed-{eq['seed']} KD runs from a bit-reproduced teacher — "
            f"in-loop {f4(eq['student_kd_inloop'])} vs cached "
            f"{f4(eq['student_kd_cached'])}, |diff| "
            f"{eq['abs_diff']:.2e} (fp-schedule noise amplified by "
            "training chaos; far inside seed variance) — the benched "
            "headline configuration trains an equivalent model.\n")


def section_kd_sweep(out):
    d = load("kd_sweep_results.json")
    if not d:
        return
    out.append("## KD hyperparameter sweep (seed 0)\n")
    out.append("`kd_sweep_results.json` — scripts/experiment_kd_sweep.py. "
               "Baselines: student alone "
               f"{f4(d['baselines']['student_alone'])}, default KD (T=2, "
               f".5/.5) {f4(d['baselines']['student_kd_T2_a.5_b.5'])}, "
               f"teacher {f4(d['baselines']['teacher'])}.\n")
    out.append("| recipe | val mIoU | vs default KD |")
    out.append("|---|---|---|")
    base = d["baselines"]["student_kd_T2_a.5_b.5"]
    for name, v in sorted(d["sweep"].items(), key=lambda kv: -kv[1]):
        dlt = v - base
        out.append(f"| {name} | {f4(v)} | {'+' if dlt >= 0 else ''}"
                   f"{pct(dlt)} pt |")
    reps = []
    for s in (1, 2):
        r = load(f"kd_sweep_s{s}.json")
        if r and "T4_a.5_b.5" in r.get("sweep", {}):
            reps.append((s, r["sweep"]["T4_a.5_b.5"],
                         r["baselines"]["student_kd_T2_a.5_b.5"]))
    if reps:
        rep = ", ".join(f"seed {s}: {f4(v)} (T=2: {f4(b)})"
                        for s, v, b in reps)
        out.append(f"\nT=4 replicated on further seeds — {rep}; it beats "
                   "T=2 on every seed tested. Defaults stay at the "
                   "standard T=2 recipe; the sweep documents the "
                   "headroom.\n")
    out.append("Feature matching alone UNDERPERFORMS the plain student "
               "(the MSE term only helps jointly with the KL term); "
               "logit-only KD captures most but not all of the lift.\n")


def section_kd_variants(out):
    d = load("kd_variants_results.json")
    if not d:
        return
    out.append("## KD generalizes across the fusion family (seed 0)\n")
    out.append("`kd_variants_results.json` — train_distill.py "
               "--fusion-type, cached teacher.\n")
    out.append("| fusion | teacher | student+KD | student alone | KD gap |")
    out.append("|---|---|---|---|---|")
    for name, r in sorted(d["per_variant"].items()):
        out.append(f"| {name} | {f4(r['teacher'])} | {f4(r['student_kd'])} "
                   f"| {f4(r['student_alone'])} | +{pct(r['kd_gap'])} pt |")
    out.append("\nThe distilled minimal student (494,978 params) is the "
               "best small model overall.\n")


def section_kd_compression(out):
    d = load("kd_compression_results.json")
    if not d:
        return
    out.append("## KD under width compression (seed 0)\n")
    out.append(
        "`kd_compression_results.json` — "
        "scripts/experiment_kd_compression.py; same "
        f"{d['teacher']['params']:,}-param teacher "
        f"(mIoU {f4(d['teacher']['miou'])}) distilled into shrinking "
        "students.\n")
    out.append("| student width | params | student alone | student+KD | "
               "KD gap |")
    out.append("|---|---|---|---|---|")
    w1 = d["w1_reference"]
    out.append(f"| 1.0 (reference) | 528,132 | {f4(w1['student'])} | "
               f"{f4(w1['student_kd'])} | "
               f"+{pct(w1['student_kd'] - w1['student'])} pt |")
    for name, r in sorted(d["sweep"].items(), reverse=True):
        out.append(f"| {name[1:]} | {r['params']:,} | {f4(r['student'])} | "
                   f"{f4(r['student_kd'])} | +{pct(r['kd_gap'])} pt |")
    t4 = d.get("t4_extension")
    if t4:
        out.append(
            f"\nSweep-best T=4 recipe compounds with compression: the "
            f"w=0.5 (143,972-param) student reaches "
            f"**{f4(t4['w0.5_T4_student_kd'])}** — a 14x-smaller student "
            "within 0.2 pt of the plain full-width student.\n")
    s1 = load("kd_compression_s1.json")
    if s1 and "w0.5" in s1.get("sweep", {}):
        r = s1["sweep"]["w0.5"]
        out.append(f"w=0.5 replicated on seed 1: +{pct(r['kd_gap'])} pt "
                   f"({f4(r['student'])} -> {f4(r['student_kd'])}).\n")


def section_kd_crossarch(out):
    d = load("kd_crossarch_results.json")
    if not d:
        return
    out.append("## Cross-architecture KD: spatial teacher -> PointPillars "
               "student\n")
    out.append("`kd_crossarch_results.json` — "
               "scripts/experiment_kd_crossarch.py; the KD taps are "
               "encoder-agnostic [B,H,W,C] BEV maps, so the teacher and "
               "student may use different LiDAR encoders.\n")
    out.append("| seed | spatial teacher | PP student | PP student+KD | "
               "paired gap |")
    out.append("|---|---|---|---|---|")
    gaps = []
    for s, r in sorted(d["per_seed"].items()):
        gap = r["pp_student_kd"] - r["pp_student"]
        gaps.append(gap)
        out.append(f"| {s} | {f4(r['teacher_spatial'])} | "
                   f"{f4(r['pp_student'])} | {f4(r['pp_student_kd'])} | "
                   f"+{pct(gap)} pt |")
    out.append(f"\nPositive on every seed (mean +{pct(sum(gaps)/len(gaps))} "
               "pt).\n")
    b = load("kd_crossarch_best.json")
    if b and b.get("per_seed"):
        out.append("Best recipe x cross-arch (`kd_crossarch_best.json` — "
                   "scripts/experiment_crossarch_best.py: noisy-student "
                   "KD, T=4, cached clean-input spatial teacher trained "
                   "with photometric augment, PP student):\n")
        out.append("| seed | teacher (aug-trained) | PP student, best "
                   "recipe | vs plain PP | vs in-loop T=2 KD |")
        out.append("|---|---|---|---|---|")
        for s, r in sorted(b["per_seed"].items()):
            vp = r.get("vs_plain")
            vk = r.get("vs_kd_t2")
            out.append(
                f"| {s} | {f4(r['teacher_spatial_aug'])} | "
                f"{f4(r['pp_student_best_recipe'])} | "
                f"{'+' if (vp or 0) >= 0 else ''}{pct(vp) if vp is not None else '—'} pt | "
                f"{'+' if (vk or 0) >= 0 else ''}{pct(vk) if vk is not None else '—'} pt |")
        if "recipe_gap_mean" in b:
            out.append(f"\nPaired gap vs the plain PP student: mean "
                       f"+{pct(b['recipe_gap_mean'])} pt, min "
                       f"{'+' if b['recipe_gap_min'] >= 0 else ''}"
                       f"{pct(b['recipe_gap_min'])} pt.\n")
        else:
            out.append("")


def section_augment(out):
    d = load("augment_results.json")
    if not d:
        return
    a = d["config"]["augment"]
    out.append("## Device-side augmentation lift (paired with the KD-lift "
               "arms)\n")
    out.append(
        "`augment_results.json` — scripts/experiment_augment.py; the "
        "standard recipe (hflip "
        f"{a['hflip_prob']}, brightness/contrast {a['brightness']}/"
        f"{a['contrast']}, noise {a['image_noise_std']}, point dropout "
        f"{a['point_dropout']}) jitted into the train step "
        "(ops/augment.py), same regime/seeds as the KD-lift table so "
        "gaps are paired per seed.\n")
    has_noisy = any("student_kd_noisy" in r for r in d["per_seed"].values())
    has_t4 = any("student_kd_noisy_t4" in r for r in d["per_seed"].values())
    hdr = "| seed | teacher | student | +aug | +KD | +KD+aug (in-loop)"
    sep = "|---|---|---|---|---|---|"
    if has_noisy:
        hdr += " | noisy-student KD"
        sep += "---|"
    if has_t4:
        hdr += " | noisy-student T=4"
        sep += "---|"
    out.append(hdr + " |")
    out.append(sep)
    for s, r in sorted(d["per_seed"].items()):
        row = (f"| {s} | {f4(r['teacher'])} | {f4(r['student'])} | "
               f"{f4(r['student_aug'])} | {f4(r['student_kd'])} | "
               f"{f4(r['student_kd_aug'])}")
        if has_noisy:
            n = r.get("student_kd_noisy")
            row += f" | {f4(n)}" if n is not None else " | —"
        if has_t4:
            n = r.get("student_kd_noisy_t4")
            row += f" | **{f4(n)}**" if n is not None else " | —"
        out.append(row + " |")
    out.append(
        f"\nAugmentation alone: mean {'+' if d['aug_gap_mean'] >= 0 else ''}"
        f"{pct(d['aug_gap_mean'])} pt (min "
        f"{'+' if d['aug_gap_min'] >= 0 else ''}{pct(d['aug_gap_min'])}) — "
        "it helps the weak/overfitting seeds most. Naive in-loop KD+aug "
        "is a wash on top of KD (mean "
        f"{'+' if d['aug_on_top_of_kd_mean'] >= 0 else ''}"
        f"{pct(d['aug_on_top_of_kd_mean'])} pt): the teacher never trained "
        "on augmented inputs, so flipping/noising its input degrades its "
        "targets.\n")
    if has_noisy:
        rows = {s: r for s, r in d["per_seed"].items()
                if "student_kd_noisy" in r}
        beats_t = sum(r["student_kd_noisy"] > r["teacher"]
                      for r in rows.values())
        out.append(
            "**Noisy-student KD** (scripts/experiment_augment_noisy.py: "
            "cached CLEAN-input teacher targets + photometric/dropout "
            "student augmentation — the composition the compatibility "
            "rules recommend) is the best student recipe measured: beats "
            "plain KD on every seed (" + ", ".join(
                f"+{pct(r['student_kd_noisy'] - r['student_kd'])}"
                for _, r in sorted(rows.items()))
            + f" pt), mean +{pct(d['noisy_gap_mean'])} pt over the plain "
            f"student, and EXCEEDS ITS OWN TEACHER on {beats_t}/"
            f"{len(rows)} seeds.\n")
    if has_t4:
        rows = {s: r for s, r in d["per_seed"].items()
                if "student_kd_noisy_t4" in r}
        beats_t = sum(r["student_kd_noisy_t4"] > r["teacher"]
                      for r in rows.values())
        mean = sum(r["student_kd_noisy_t4"] for r in rows.values()) \
            / len(rows)
        out.append(
            "Composing the sweep-best temperature into the noisy-student "
            "recipe (**best recipe**, scripts/experiment_best_recipe.py: "
            "cached clean teacher + photometric augment + T=4) gives the "
            f"best student measured: mean {f4(mean)}, above its own "
            f"teacher on {beats_t}/{len(rows)} seeds (vs T=2 noisy: "
            + ", ".join(
                f"{'+' if r['student_kd_noisy_t4'] >= r['student_kd_noisy'] else ''}"
                f"{pct(r['student_kd_noisy_t4'] - r['student_kd_noisy'])}"
                for _, r in sorted(rows.items())) + " pt).\n")
        w_rows = {s: r for s, r in d["per_seed"].items()
                  if any(k.startswith("student_kd_noisy_t4_w")
                         for k in r)}
        if w_rows:
            frags = []
            for s, r in sorted(w_rows.items()):
                for k in sorted(r):
                    if k.startswith("student_kd_noisy_t4_w"):
                        frags.append(f"seed {s} {k.split('_')[-1]}: "
                                     f"{f4(r[k])}")
            out.append(
                "Compressed best recipe (same arm at reduced student "
                "width): " + "; ".join(frags) + ". MIXED — at half width "
                "the augmentation noise is not reliably beneficial: vs "
                "the same-seed clean-teacher baselines "
                "(kd_compression_results.json) the noisy arm LOSES 3.1 pt "
                "to clean T=4 on seed 0 (0.8466 vs 0.8781) and wins "
                "+0.9 pt over clean T=2 on seed 1; seed 2 reaches 0.8867 "
                "(above its own teacher). The clean T=4 recipe stays the "
                "recommendation for capacity-limited students; the "
                "full-width composition above is the recommendation at "
                "reference size.\n")


def section_best_overall(out):
    d = load("best_overall_results.json")
    if not d:
        return
    out.append("## Best overall model: minimal/128 student under the "
               "best recipe\n")
    out.append(
        "`best_overall_results.json` — scripts/experiment_best_overall.py; "
        "the best recipe (cached clean-input teacher targets, "
        "photometric/dropout student augmentation, T=4) applied to the "
        "strongest family (minimal fusion, 494,978 params), teacher = 2x "
        "minimal trained WITH photometric augmentation. Not paired with "
        "the kd_variants table (different teacher); the claim is "
        "absolute best-student accuracy.\n")
    out.append("| seed | teacher | student (best recipe) |")
    out.append("|---|---|---|")
    for s, r in sorted(d["per_seed"].items()):
        out.append(f"| {s} | {f4(r['teacher'])} | "
                   f"**{f4(r['student_best_recipe'])}** |")
    out.append(
        f"\nMean student {f4(d['mean_student'])} — the best student "
        "accuracy measured in this project (prior best small model: "
        "0.9270, kd_variants minimal+KD seed 0), within a point of its "
        "own 2x teacher at a quarter of the teacher's parameters.\n")


def section_kd_ensemble(out):
    d = load("kd_ensemble_results.json")
    if not d:
        return
    out.append("## Ensemble-teacher KD: 2 teachers vs 1 under the best "
               "recipe\n")
    out.append(
        "`kd_ensemble_results.json` — scripts/experiment_kd_ensemble.py; "
        "the best-overall regime with the teacher replaced by a 2-member "
        "deep ensemble (independently trained 2x minimal members, seeds "
        "offset 1000; member-averaged logits/taps — EnsembleTeacher). "
        "Paired per seed against best_overall_results.json: member A "
        "reproduces the committed teacher run, so the committed student "
        "is the single-teacher arm.\n")
    out.append("| seed | teacher A | teacher B | student (ensemble) | "
               "student (single, committed) | gap |")
    out.append("|---|---|---|---|---|---|")
    for s, r in sorted(d["per_seed"].items()):
        g = r["gap_vs_single"]
        repro = "" if r["teacher_a_reproduces_committed"] else " (!)"
        out.append(
            f"| {s} | {f4(r['teacher_a'])}{repro} | {f4(r['teacher_b'])} | "
            f"**{f4(r['student_ensemble'])}** | "
            f"{f4(r['student_single_teacher_committed'])} | "
            f"{'+' if g >= 0 else ''}{pct(g)} pt |")
    out.append(
        f"\nMean ensemble student {f4(d['mean_student_ensemble'])} vs "
        f"single-teacher {f4(d['mean_student_single'])}.\n")


def section_teacher_scaling(out):
    d = load("teacher_scaling_results.json")
    if not d:
        return
    seed = d["config"]["seed"]
    out.append("## Teacher-width scaling under the best recipe\n")
    out.append(
        f"`teacher_scaling_results.json` — "
        "scripts/experiment_teacher_scaling.py; the best-overall regime "
        f"(seed {seed}) with the teacher's width multiplier swept. "
        "w=2.0 is the committed best_overall anchor (same seed/config); "
        "w=1.0 is self-distillation (teacher == student architecture); "
        "w=4.0 is 16x the student's FLOPs — the regime where the teacher "
        "outgrows one chip and tp/sp teacher partitioning applies.\n")
    out.append("| teacher width | teacher | student |")
    out.append("|---|---|---|")
    for w, r in sorted(d["per_width"].items(), key=lambda t: float(t[0])):
        out.append(f"| {w} | {f4(r['teacher'])} | **{f4(r['student'])}** |")
    out.append("")
    extra = [(s, load(f"teacher_scaling_s{s}.json")) for s in (1, 2)]
    extra = [(s, e) for s, e in extra if e and "4.0" in e["per_width"]]
    if extra:
        out.append("w=4.0 replicated across seeds (`teacher_scaling_s{1,2}"
                   ".json`; the w=2.0 anchor is each seed's committed "
                   "best_overall arm):\n")
        out.append("| seed | w=4 teacher | w=4 student | w=2 student "
                   "(committed) | gap |")
        out.append("|---|---|---|---|---|")
        rows = [(str(seed), e["per_width"]) for seed, e in extra]
        rows.insert(0, (str(seed), d["per_width"]))
        for s, pw in rows:
            r4, r2 = pw["4.0"], pw.get("2.0")
            if r2 is None:
                continue
            g = r4["student"] - r2["student"]
            out.append(
                f"| {s} | {f4(r4['teacher'])} | **{f4(r4['student'])}** | "
                f"{f4(r2['student'])} | {'+' if g >= 0 else ''}{pct(g)} pt |")
        out.append("")


def section_capacity_gap(out):
    d = load("capacity_gap_results.json")
    if not d:
        return
    seed = d["config"]["seed"]
    sw = d["config"]["student"]
    full = load("teacher_scaling_results.json") or {"per_width": {}}
    out.append("## Capacity gap: teacher width vs a HALF-width student\n")
    out.append(
        "`capacity_gap_results.json` — scripts/experiment_capacity_gap.py; "
        f"same regime/recipe/seed ({seed}) as the teacher-width scaling "
        f"sweep but the student is {sw}. The classic capacity-gap "
        "question (Mirzadeh et al.'s teacher-assistant setup): does the "
        "biggest teacher stop helping once the student is far smaller? "
        "Full-size-student rows repeated from "
        "teacher_scaling_results.json for side-by-side reading.\n")
    out.append("| teacher width | teacher | student w=0.5 | "
               "student w=1.0 (tscale) |")
    out.append("|---|---|---|---|")
    for w, r in sorted(d["per_teacher_width"].items(),
                       key=lambda t: float(t[0])):
        fr = full["per_width"].get(w)
        fs = f4(fr["student"]) if fr else "—"
        out.append(f"| {w} | {f4(r['teacher'])} | **{f4(r['student'])}** | "
                   f"{fs} |")
    out.append("")


def section_ta_chain(out):
    d = load("ta_chain_results.json")
    if not d or "student" not in d["stages"]:
        return
    grid = load("capacity_gap_results.json") or {"per_teacher_width": {}}
    out.append("## Teacher-assistant chain (w=4 → w=1 TA → w=0.5)\n")
    out.append(
        "`ta_chain_results.json` — scripts/experiment_ta_chain.py; the "
        "classic Mirzadeh et al. fix for the capacity gap, measured "
        "against the direct cells of the grid above (same seed/regime/"
        "recipe). Stage A distills the grid's w=4 teacher into a "
        "full-size TA (also a reproduction of the tscale w=4 row, "
        f"committed {f4(d['tscale_w4_student_committed'])}); stage B "
        "distills the TA into the half-width student.\n")
    out.append("| arm | w=0.5 student |")
    out.append("|---|---|")
    for tw, r in sorted(grid["per_teacher_width"].items(),
                        key=lambda t: float(t[0])):
        out.append(f"| direct w{tw} → 0.5 | {f4(r['student'])} |")
    out.append(f"| chain w4 → 1 → 0.5 | **{f4(d['stages']['student'])}** |")
    out.append(f"\nStage-A TA (w=1, KD-trained from the w=4 teacher): "
               f"{f4(d['stages']['ta'])}.\n")


def section_ema(out):
    d = load("ema_results.json")
    if not d:
        return
    decay = d["config"]["ema_decay"]
    out.append("## EMA weights: measured and closed (neutral here)\n")
    out.append(
        f"`ema_results.json` — scripts/experiment_ema.py; "
        f"TrainConfig.ema_decay={decay} in the same paired regime "
        "(validation and best-checkpointing read the EMA shadow).\n")
    out.append("| seed | student | +EMA | gap | +aug | +aug+EMA | gap |")
    out.append("|---|---|---|---|---|---|---|")
    for s, r in sorted(d["per_seed"].items()):
        g1 = r["student_ema"] - r["student"]
        g2 = r["student_aug_ema"] - r["student_aug"]
        out.append(
            f"| {s} | {f4(r['student'])} | {f4(r['student_ema'])} | "
            f"{'+' if g1 >= 0 else ''}{pct(g1)} pt | "
            f"{f4(r['student_aug'])} | {f4(r['student_aug_ema'])} | "
            f"{'+' if g2 >= 0 else ''}{pct(g2)} pt |")
    out.append(
        f"\nAt decay {decay} over ~520 steps EMA is a wash to slightly "
        "negative (-0.7 to +0.2 pt): cosine annealing already averages "
        "the endpoint, and best-epoch checkpointing on a 40-epoch run "
        "captures the same stability EMA would. Stays a tested opt-in "
        "for long/noisy runs; not part of the best recipe.\n")


def section_fusion_ablation(out):
    d = load("fusion_ablation_hard_seeded.json")
    if not d:
        return
    out.append("## Fusion ablation (hard benchmark, 3 seeds, paired)\n")
    out.append("`fusion_ablation_hard_seeded.json` — "
               "scripts/train_fusion_ablation.py per seed.\n")
    out.append("| seed | concat | minimal | weighted |")
    out.append("|---|---|---|---|")
    sums = {"concat": 0.0, "minimal": 0.0, "weighted": 0.0}
    n = 0
    for s, r in sorted(d["per_seed"].items()):
        n += 1
        for k in sums:
            sums[k] += r[k]
        out.append(f"| {s} | {f4(r['concat'])} | {f4(r['minimal'])} | "
                   f"{f4(r['weighted'])} |")
    out.append("| **mean** | " + " | ".join(
        f"**{f4(sums[k] / n)}**" for k in ("concat", "minimal", "weighted"))
        + " |")
    out.append("\nWeighted trails BOTH other variants on every seed; "
               "minimal-vs-concat stays within seed noise. (On the easy "
               "synthetic fixture all three saturate at 0.9997+ — "
               "`fusion_ablation_results.json` — with param counts matching "
               "the reference exactly: 573,442 / 494,978 / 528,132.)\n")
    pp = load("pp_ablation_seeded.json")
    if pp:
        out.append("PointPillars vs spatial LiDAR encoder "
                   "(`pp_ablation_seeded.json`, weighted/128 student): "
                   "paired gaps " + ", ".join(
                       f"{'+' if r['paired_gap'] >= 0 else ''}"
                       f"{pct(r['paired_gap'])}"
                       for _, r in sorted(pp["per_seed"].items()))
                   + f" pt; mean {f4(pp['mean_miou']['pointpillars'])} vs "
                   f"{f4(pp['mean_miou']['spatial'])} — the native PFN is "
                   "competitive end-to-end and avoids spatial's seed-2 "
                   "dip.\n")


def section_weighted_gate(out):
    d = load("docs/weighted_gate_analysis.json")
    if not d:
        return
    v = d["gate_variants_val_miou"]
    s = d["gate_stats"]
    out.append("## Why weighted fusion trails: gate ablation on a trained "
               "model\n")
    out.append("`docs/weighted_gate_analysis.json` — "
               "scripts/analyze_weighted_gate.py; eval-time variable edits "
               "replace the per-pixel softmax gate exactly.\n")
    out.append("| gate variant | val mIoU |")
    out.append("|---|---|")
    for k in ("trained", "uniform", "camera_only", "lidar_only"):
        out.append(f"| {k} | {f4(v[k]['miou'])} |")
    out.append(
        f"\nThe learned gate contributes +{pct(d['gate_contribution_pt']/100)}"
        " pt over a uniform gate and is a near-binary switch "
        f"({pct(s['decisive_pixel_fraction_gt_0.7'])}% of pixels decisive "
        "> 0.7) whose camera weight tracks BEV occupancy at rho = "
        f"{s['corr_camera_weight_vs_bev_occupancy']:+.2f} — it selects "
        "camera features where LiDAR returns exist and the (zero-valued) "
        "LiDAR branch elsewhere. A convex per-pixel selection can only "
        "interpolate the modalities; minimal's addition superposes them, "
        "which is what the cross-modal distractors demand — the weighted "
        "family is architecturally capped, not under-trained (full "
        "argument: docs/DESIGN.md).\n")
    g = load("fusion_gated_sum_results.json")
    if g and g.get("per_seed"):
        rows = " / ".join(f4(g["per_seed"][s]["gated_sum"])
                          for s in sorted(g["per_seed"]))
        out.append(
            "The suggested fix was built and measured "
            "(`fusion_gated_sum_results.json` — GatedSumFusion, independent "
            "sigmoid gates, same parameter tree): paired per seed it scores "
            f"{rows} — above weighted on 2/3 seeds but a 12-pt low plateau "
            "on seed 1 and below minimal/concat everywhere. The liability "
            "is the learned gate itself, not its normalization; the "
            "parameter-free addition is the right inductive bias here. "
            "Ships as fusion_type=\"gated_sum\" with this closure as its "
            "documentation.\n")


def section_perf(out):
    out.append("## Performance (real TPU v5e, B=32 bf16)\n")
    out.append("Official headline = the driver's bench.py run "
               "(BENCH_r*.json). Reference CPU baseline: 3.05 frames/s "
               "train step, 80.9 ms eval p50 (BASELINE.md).\n")
    rb = load("docs/roofline_r3_sorted_breakdown.json")
    if rb:
        out.append("Step breakdown (`docs/roofline_r3_sorted_breakdown."
                   "json`, scan-timed, XLA cost analysis):\n")
        out.append("| component | ms | XLA GB | % of HBM roofline | MFU |")
        out.append("|---|---|---|---|---|")
        for r in rb["results"]:
            out.append(f"| {r['name']} | {r['ms']:.2f} | "
                       f"{r['xla_gbytes']:.2f} | {r['pct_of_roofline']} | "
                       f"{r['mfu_pct']}% |")
        out.append("")
    sh = load("docs/scatter_shootout_v5e_b32.json")
    if sh:
        out.append("Scatter-max shootout (`docs/scatter_shootout_v5e_b32."
                   "json`; the sorted-input MXU Pallas kernel is the bench "
                   "default on TPU):\n")
        out.append("| variant | ms |")
        out.append("|---|---|")
        for r in sh["results"]:
            out.append(f"| {r['name']} | {r['ms']:.2f} |")
        out.append("")
    kt = load("docs/kd_tail_v5e_b32.json")
    if kt:
        out.append(f"KD-tail decomposition (`docs/kd_tail_v5e_b32.json`): "
                   f"full step {kt['step_ms']['full']:.2f} ms; feature "
                   f"matching {kt['feature_match_ms']:.2f} ms; logit KL "
                   "~0 ms (fused into the tail).\n")
    kt4 = load("docs/kd_tail_r4_v5e_b32.json")
    if kt4:
        out.append(
            f"KD-tail closure (round 4, `docs/kd_tail_r4_v5e_b32.json`): "
            f"loss-term tail {kt4['step_ms']['full'] - kt4['step_ms']['ce_only']:.2f} ms "
            f"(full {kt4['step_ms']['full']:.2f} vs CE-only "
            f"{kt4['step_ms']['ce_only']:.2f}); bf16 taps cut XLA feature "
            f"matching to {kt4['feature_match_ms']:.2f} ms; the fused "
            f"Pallas FM kernel measures "
            f"{kt4['step_ms']['full_pallas_fm'] - kt4['step_ms']['full']:+.2f} ms "
            "vs the XLA path in the benched config — XLA stays default.\n")
    ts = load("docs/sorted_scatter_tile_sweep_v5e.json")
    if ts:
        rows = ", ".join(f"tile {r['tile']}: fwd {r['fwd_ms']:.2f}/"
                         f"bwd {r['fwdbwd_ms']:.2f} ms"
                         for r in ts["results"] if r.get("correct"))
        out.append(
            f"Sorted-scatter tile-width sweep (round 4, "
            f"`docs/sorted_scatter_tile_sweep_v5e.json`): {rows} — fwd is "
            "flat, bwd degrades with tile width; the forward's slack over "
            "its byte roofline is intrinsic VPU scan issue cost, closing "
            "the lever (docs/DESIGN.md).\n")
    dr = load("docs/dress_rehearsal_v5e.json")
    if dr:
        out.append(
            "PandaSet-scale feeding dress rehearsal (round 4, "
            "`docs/dress_rehearsal_v5e.json` — 1,920+480 fabricated "
            "frames at real raw sizes, cached-teacher KD on-chip):\n")
        out.append("| feeding mode | ep1 wall s | ep2 | ep3 | steady input stall |")
        out.append("|---|---|---|---|---|")
        for mode, rows in dr["modes"].items():
            st = max(r["stall_frac"] for r in rows[1:])
            out.append(f"| {mode} | {rows[0]['wall_s']} | "
                       f"{rows[1]['wall_s']} | {rows[2]['wall_s']} | "
                       f"{st:.0%} |")
        out.append("")
    ocd = load("docs/dress_rehearsal_onchip_v5e.json")
    if ocd:
        pk = ocd["modes"]["packed"]
        oc_rows = ocd["modes"]["onchip"]
        out.append(
            "On-chip epochs at REFERENCE scale (round 5, "
            "`docs/dress_rehearsal_onchip_v5e.json`, same-day pairing, "
            "1,920 train frames, cached-teacher KD, sorted_pallas + "
            f"onchip_contiguous): steady epoch {oc_rows[1]['wall_s']} s "
            f"({oc_rows[1]['frames_per_sec']:.0f} frames/s) as one "
            f"dispatch vs {pk[1]['wall_s']} s host-driven packed — "
            "reference-scale training on this relay-attached host is now "
            "chip-bound (BASELINE.md).\n")
    oc = load("docs/onchip_cached_v5e.json")
    if oc:
        r = oc["results"]
        contig = r.get("onchip_contig")
        gp = oc.get("gather_probe")
        msg = (
            f"Cached-teacher x on-chip epoch (round 5, "
            f"`docs/onchip_cached_v5e.json`, {oc['num_train']} samples): "
            f"steady-state epoch {r['onchip']['steady_epoch_ms_mean']:.0f} ms "
            f"as one on-chip scan vs "
            f"{r['per_batch']['steady_epoch_ms_mean']:.0f} ms per-batch — "
            "dispatch/transfer fully amortized.")
        if contig:
            msg += (f" `onchip_contiguous` (pre-permute + contiguous "
                    f"slices) cuts it to "
                    f"{contig['steady_epoch_ms_mean']:.0f} ms")
        if gp:
            msg += (f"; the removed per-step gathers measured "
                    f"{gp['ms_per_step']} ms/step at {gp['effective_gbps']}"
                    " GB/s effective (gather-only probe — see DESIGN.md "
                    "\"gather tax\")")
        out.append(msg + ".\n")
    q = load("docs/quant_eval_v5e.json")
    if q:
        out.append(
            f"Int8 (w8a8) PTQ serving path (`docs/quant_eval_v5e.json`): "
            f"{q['quantized_convs']} convs quantized, decisive-argmax "
            f"agreement {q['decisive_argmax_agreement']}; measured SLOWER "
            f"({q['b32_ms_int8']:.2f} vs {q['b32_ms_base']:.2f} ms at "
            "B=32) because the forward is memory-bound, so int8 stays a "
            "correctness-complete opt-in (rationale in "
            "lmsu_tpu/ops/quant.py).\n")
    qa = load("docs/quant_accuracy_v5e.json")
    if qa:
        out.append(
            f"Int8 PTQ **accuracy** on a trained model "
            f"(`docs/quant_accuracy_v5e.json`, {qa['model']}, "
            f"{qa['benchmark']}): fp32 val mIoU {f4(qa['fp32']['miou'])} "
            f"vs int8 {f4(qa['int8']['miou'])} (delta "
            f"{'+' if qa['miou_delta'] >= 0 else ''}{pct(qa['miou_delta'], 2)} "
            f"pt), pixel argmax agreement "
            f"{pct(qa['argmax_agreement'], 3)}% — calibrated on "
            f"{qa['calib_batches']} train batches.\n")
    sv = load("docs/serving_bench_v5e.json")
    if sv:
        det = sv["detail"]
        out.append("Online serving (`docs/serving_bench_v5e.json`, "
                   f"B={det['batch_size']} engine, closed-loop):\n")
        out.append("| concurrency | req/s | p50 ms | p99 ms |")
        out.append("|---|---|---|---|")
        for lv in det["levels"]:
            out.append(f"| {lv['concurrency']} | {lv['throughput_rps']} | "
                       f"{lv['latency_ms']['p50']} | "
                       f"{lv['latency_ms']['p99']} |")
        b1 = det.get("baseline_b1")
        if b1:
            out.append(f"| 1 (dedicated B=1 engine) | "
                       f"{b1['throughput_rps']} | "
                       f"{b1['latency_ms']['p50']} | "
                       f"{b1['latency_ms']['p99']} |")
        out.append("\nCeiling on this host is the 1-vCPU client side + "
                   "relay transport, not the chip (~6,900 frames/s "
                   "batched-eval capacity).\n")
        soak = sv.get("soak_r4")
        if soak:
            lm = soak["latency_ms"]
            # percentiles() reports p999=None for runs with <1000 samples.
            p999 = (f"{lm['p999']:.0f}" if lm.get("p999") is not None
                    else "n/a")
            out.append(
                f"Steady-state soak (round 4, C={soak['concurrency']}, "
                f"{soak['duration_s']:.0f} s, {soak['completed']} "
                f"requests): {soak['throughput_rps']} req/s, p50 "
                f"{lm['p50']:.0f} / p99 {lm['p99']:.0f} / p999 "
                f"{p999} ms; split-half throughput "
                f"{soak['first_half']['throughput_rps']} -> "
                f"{soak['second_half']['throughput_rps']} req/s (no "
                "degradation; that day's absolute rps was relay-"
                "transport-bound — see the note in the artifact).\n")
        sat = sv.get("saturation_r5")
        if sat:
            out.append(
                f"Engine SATURATION (round 5, open-loop burst, "
                f"{sat['duration_s']:.0f} s): occupancy "
                f"**{sat['occupancy']}** (closed-loop max on this host was "
                f"0.37), {sat['throughput_rps']} req/s with zero drift "
                f"({sat['first_half_rps']} -> {sat['second_half_rps']}); "
                "every dispatched batch full; absolute rps stays relay-"
                "transport-bound.\n")
        nb = sv.get("null_backend_r5")
        if nb:
            out.append(
                f"Engine SOFTWARE ceiling (round 5, null backend at "
                f"{nb['batch_ms']} ms/batch = the chip's measured B=32 "
                f"eval forward): **{nb['throughput_rps']} req/s** at "
                f"occupancy {nb['occupancy']} with the shed boundary "
                f"exercised ({nb['shed']} sheds) — the engine machinery "
                "on ONE host vCPU covers ~64% of the chip's ~6,900 f/s "
                "batched capacity; submit()-side preprocessing scales "
                "with client cores on a standard serving host.\n")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stdout", action="store_true")
    args = ap.parse_args(argv)

    out = [
        "# RESULTS — consolidated experiment & measurement report",
        "",
        "Generated by `python scripts/summarize_experiments.py` from the "
        "committed JSON artifacts (regenerate after adding experiments). "
        "Benchmark: the hard synthetic fixture "
        "(`lmsu_tpu/data/synthetic.py`, `difficulty=\"hard\"`) — "
        "PandaSet-like class imbalance, cross-modal distractors, "
        "occlusions, LiDAR dropout. All accuracy numbers are val mIoU; "
        "all runs were executed on the real TPU v5e.",
        "",
    ]
    section_kd_lift(out)
    section_kd_sweep(out)
    section_kd_variants(out)
    section_kd_compression(out)
    section_kd_crossarch(out)
    section_augment(out)
    section_best_overall(out)
    section_kd_ensemble(out)
    section_teacher_scaling(out)
    section_capacity_gap(out)
    section_ta_chain(out)
    section_ema(out)
    section_fusion_ablation(out)
    section_weighted_gate(out)
    section_perf(out)
    text = "\n".join(out).rstrip() + "\n"
    if args.stdout:
        sys.stdout.write(text)
    else:
        with open("RESULTS.md", "w") as f:
            f.write(text)
        print(f"wrote RESULTS.md ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
