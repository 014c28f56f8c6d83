#!/usr/bin/env python
"""Regenerate REPRODUCTION.md from the archived studies/results/*.json.

Separated from run_all_tpu.py so an interrupted reproduction run (results are
flushed per study) can still produce the combined report, and so the report
can be re-rendered without re-running anything.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from studies.reference_values import (
    REFERENCE_ERRORS,
    REFERENCE_FINAL_RATE,
    REFERENCE_FINEST_WALLCLOCK,
)

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")
REPRO_MD = os.path.join(os.path.dirname(__file__), "..", "REPRODUCTION.md")

# Presentation order (matches run_all_tpu.PLAN grouping by study).
ORDER = [
    (study, kind)
    for study in [
        "pol",
        "expsin",
        "nfsp_cpcsH2_TclcdH3",
        "nfsp_cpcsH2_TclcdH2",
        "nfsp_cpcsH1_TclcdH2",
        "peaks_fast1e1",
    ]
    for kind in ["spatial", "temporal", "eta"]
]


def _load(study, kind, results_dir=RESULTS_DIR):
    # eta studies may be archived as *_eta_batched.json or *_eta.json
    for suffix in ([kind] if kind != "eta" else ["eta_batched", "eta"]):
        path = os.path.join(results_dir, f"{study}_{suffix}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
    return None


def write_report(
    device: str = "",
    total_s: float | None = None,
    results_dir: str = RESULTS_DIR,
    out_path: str = REPRO_MD,
) -> str:
    lines = [
        "# REPRODUCTION — the six reference convergence studies on TPU",
        "",
        (f"Device: {device}; " if device else "") + "float64; PC-RegHCsTriple, eta=50 (eta",
        "studies sweep 10..1000); protocols and per-notebook model constants",
        "identical to the reference notebooks (see studies/reference_values.py for",
        "the extracted ground truth and protocol notes).  'max rel dev' is the",
        "worst per-level relative deviation of our error vs the notebook's saved",
        "output across the WHOLE ladder, not just the finest level.  'steady' is",
        "the warm-cache compile-free wall-clock of the finest level (the honest",
        "apples-to-apples number vs the reference's serial CPU time); first-run",
        "times (including one-time XLA compilation) are archived in the JSONs.",
        "",
        "'adjudicated': when max rel dev exceeds the 1e-8 gate the driver",
        "re-runs the worst affordable level on CPU x64 in a subprocess",
        "(studies/adjudicate_level.py) — exact f64 arithmetic, no emulation —",
        "and reports that level's CPU-vs-reference deviation here; '—' means",
        "the study was within the gate and needed no adjudication.",
        "",
        "'mode': the arithmetic that produced the row — 'f64' (per-level",
        "full-f64 programs) or 'mixed' (f64-accurate iterative refinement",
        "around native-f32 Krylov, the fast default; where present, the",
        "'f64 spot' sub-value is the measured relative gap between the",
        "mixed and full-f64 result of the finest level, re-run in f64 as",
        "part of the same refresh).",
        "",
        "| study | kind | mode | levels | final error (ours) | final error (ref) | "
        "max rel dev | adjudicated | final rate (ours/ref) | finest steady vs ref | speedup |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    missing = []
    for study, kind in ORDER:
        res = _load(study, kind, results_dir)
        if res is None:
            missing.append((study, kind))
            lines.append(f"| {study} | {kind} | MISSING | | | | | | | | |")
            continue
        ref_errors = REFERENCE_ERRORS.get((study, kind), [])
        ref_rate = REFERENCE_FINAL_RATE.get((study, kind))
        ref_t = REFERENCE_FINEST_WALLCLOCK.get((study, kind))
        final_err = res["errors"][-1]
        final_rate = res["rates"][-1] if res.get("rates") else float("nan")
        steady = (res.get("steady_s") or res["wallclock_s"])[-1]
        dev = res.get("max_rel_dev_vs_reference", float("nan"))
        adj = res.get("adjudication")
        if adj is None:
            adj_cell = "—"
        elif adj.get("status") == "ok":
            adj_cell = (
                f"L{adj['level']} cpu-x64 {adj['cpu_rel_dev']:.1e} "
                f"{'PASS' if adj['passed'] else '**FAIL**'}"
            )
        else:
            adj_cell = adj.get("status", "?")
        mode_cell = res.get("precision", "f64").replace("full", "f64")
        if res.get("batched"):
            mode_cell += " batched"
        spot = res.get("f64_spotcheck")
        if spot:
            mode_cell += f", f64 spot {spot['mixed_vs_f64_rel']:.0e}"
        lines.append(
            f"| {study} | {kind} | {mode_cell} | {len(res['errors'])} | {final_err:.3e} | "
            f"{(f'{ref_errors[-1]:.3e}' if ref_errors else '—')} | "
            f"{dev:.1e} | {adj_cell} | "
            f"{final_rate:.3f} / {(f'{ref_rate:.3f}' if ref_rate else '—')} | "
            f"{steady:.2f}s vs {(f'{ref_t:.0f}s' if ref_t else '—')} | "
            f"{(f'{ref_t / steady:.0f}x' if ref_t and steady > 0 else '—')} |"
        )

    lines += [
        "",
        "## Per-level detail",
        "",
        "Full per-level errors, reference values, first-run and steady",
        "wall-clocks are archived in `studies/results/*.json`",
        "(`errors` / `reference_errors` / `wallclock_s` / `steady_s`).",
        "",
        "## Notes",
        "",
        "- Eta sweeps run all seven regularization factors in ONE vmapped XLA",
        "  program (the reference loops them serially); the sweep's wall-clock",
        "  column is the whole batch.",
        "- The peaks temporal ladder reproduces the reference protocol exactly,",
        "  including its quirk: the notebook recomputes N = ceil(1/(2 dt)) per",
        "  level (FIXED_GRID_SIZE=200 is dead code in cell 11) and its first",
        "  two levels use an N=1 all-boundary grid whose error is identically",
        "  0.0 (every node is pinned to the boundary value and the manufactured",
        "  solution vanishes there).",
        "- Temporal ladders whose rates are nan/negative reproduce the",
        "  reference's own behavior (errors sitting on the spatial floor).",
        "- TPU f64-emulation rounding is program-shape-dependent (see the TPU",
        "  float64 notes in README.md); study configs are pinned by per-study",
        "  measurement (e.g. the peaks min_krylov_unroll=16 floor in",
        "  harness/studies.py).  CPU x64 reproduces the reference to <=1e-8",
        "  relative for every solver shape (tests/test_parity_golden.py and",
        "  studies/results/expsin_cpu_check.json).",
    ]
    if total_s is not None:
        lines.append(f"- Wall-clock of the invocation that last refreshed this report:")
        lines.append(f"  {total_s:.0f}s (one TPU chip, f64, persistent compile cache;")
        lines.append("  partial --only reruns refresh only their own rows).")
    if missing:
        lines.append(f"- Missing runs: {missing} (rerun `python studies/run_all_tpu.py`).")
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(text)
    return out_path


if __name__ == "__main__":
    print(f"wrote {write_report()}")
