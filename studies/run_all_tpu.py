#!/usr/bin/env python
"""Full reproduction of all six reference convergence-study notebooks.

Runs every study (spatial + temporal + eta sweep, 18 runs total) sequentially
on the attached accelerator, saving per-study JSON under studies/results/ and
a combined REPRODUCTION.md at the repo root with per-level comparison against
the notebooks' saved outputs (studies/reference_values.py).  Safe to
interrupt: results are flushed per study and completed levels replay from the
persistent compilation cache.
"""

import json
import math
import os
import sys
import time
import traceback

# repo root on sys.path without touching PYTHONPATH (which carries the
# device-plugin site dir on this machine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:  # de-risking runs while another process holds the TPU
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from na_dd_tpu.config import enable_persistent_compilation_cache

if "--cpu" not in sys.argv:
    enable_persistent_compilation_cache()

from na_dd_tpu.harness.studies import (
    run_eta_study_batched,
    run_spatial_study,
    run_temporal_study,
)
from studies.reference_values import REFERENCE_ERRORS

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")
REPRO_MD = os.path.join(os.path.dirname(__file__), "..", "REPRODUCTION.md")

# Ordered so the cheap/headline studies land first; heavy Tf=1 spatial
# ladders in the middle; the long peaks temporal ladder last.
PLAN = [
    ("pol", "spatial", dict(levels=8)),
    ("pol", "temporal", {}),
    ("pol", "eta", {}),
    ("expsin", "spatial", dict(levels=8)),
    ("expsin", "temporal", {}),
    ("expsin", "eta", {}),
    ("nfsp_cpcsH2_TclcdH3", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH3", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH3", "eta", {}),
    ("nfsp_cpcsH2_TclcdH2", "spatial", dict(levels=8)),
    ("nfsp_cpcsH2_TclcdH2", "temporal", {}),
    ("nfsp_cpcsH2_TclcdH2", "eta", {}),
    ("nfsp_cpcsH1_TclcdH2", "spatial", dict(levels=8)),
    ("nfsp_cpcsH1_TclcdH2", "temporal", {}),
    ("nfsp_cpcsH1_TclcdH2", "eta", {}),
    ("peaks_fast1e1", "spatial", dict(levels=8)),
    ("peaks_fast1e1", "eta", {}),
    ("peaks_fast1e1", "temporal", {}),
]


def _save_json(result):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, f"{result['study']}_{result['kind']}.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)


def _max_rel_dev(ours, ref):
    """Max per-level relative deviation vs the reference list (nan-safe)."""
    devs = []
    for a, b in zip(ours, ref):
        if b == 0.0:
            devs.append(0.0 if a == 0.0 else math.inf)
        else:
            devs.append(abs(a - b) / abs(b))
    return max(devs) if devs else float("nan")


#: Reference-parity gate (relative).  TPU results beyond it are not accepted
#: on faith: the driver adjudicates the worst offending level on CPU x64 in a
#: subprocess (the f64-emulation noise is program-shape-dependent — see
#: docs/axon_f64_scan_fusion_bug.md — while CPU x64 reproduces the reference
#: exactly for every solver shape measured).
PARITY_GATE = 1e-8


def _adjudicate(res, ref_errors):
    """CPU-x64 adjudication of the worst over-gate level (subprocess).

    Picks the level with the largest relative deviation whose estimated cost
    fits NA_DD_ADJUDICATE_BUDGET node-steps (default 5e7 — a few minutes on
    the single CPU core; the expensive Tf=1 finest levels would take hours
    there), runs studies/adjudicate_level.py with a hard timeout, and returns
    the parsed verdict dict (or a status record on skip/timeout/crash)."""
    import subprocess

    if os.environ.get("NA_DD_ADJUDICATE", "1") == "0":
        return {"status": "disabled"}
    from studies.adjudicate_level import level_cost

    budget = float(os.environ.get("NA_DD_ADJUDICATE_BUDGET", 5e7))
    kind = res["kind"].replace("eta_batched", "eta")
    devs = []
    for k, (a, b) in enumerate(zip(res["errors"], ref_errors)):
        dev = (0.0 if a == b == 0.0 else math.inf) if b == 0.0 else abs(a - b) / abs(b)
        devs.append((dev, k))
    over = [(d, k) for d, k in devs if d > PARITY_GATE]
    affordable = [
        (d, k) for d, k in over if level_cost(res["study"], kind, k) <= budget
    ]
    if not affordable:
        return {
            "status": "skipped_over_budget",
            "over_gate_levels": [k for _, k in over],
            "budget_node_steps": budget,
        }
    dev, k = max(affordable)
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "adjudicate_level.py"),
        res["study"], kind, str(k),
    ]
    timeout_s = float(os.environ.get("NA_DD_ADJUDICATE_TIMEOUT", 3600))
    print(f"  [adjudicate] worst affordable level {k} (TPU dev {dev:.2e}) "
          f"on CPU x64 ...", flush=True)
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "level": k, "timeout_s": timeout_s}
    for line in proc.stdout.splitlines():
        if line.startswith("ADJUDICATION_JSON: "):
            verdict = json.loads(line[len("ADJUDICATION_JSON: "):])
            verdict["status"] = "ok"
            verdict["tpu_rel_dev"] = dev
            affordable_levels = {kk for _d, kk in affordable}
            verdict["skipped_over_budget_levels"] = [
                kk for _d, kk in over if kk not in affordable_levels
            ]
            return verdict
    return {
        "status": "crashed",
        "level": k,
        "rc": proc.returncode,
        "stderr_tail": proc.stderr[-500:],
    }


def _f64_spotcheck(study, kind, level, mixed_error):
    """Fast-mode guard: re-run ONE level in full f64 and compare with the
    mixed-mode value (mixed reproduces f64 to ~1e-11 relative — measured,
    studies/mixed_peaks_probe.py; a larger gap flags a refinement problem)."""
    from na_dd_tpu.harness.studies import (
        STUDIES,
        _make_trial,
        _study_unroll,
        study_consts,
    )

    cfg = STUDIES[study]
    mc = study_consts(study)
    if kind == "spatial":
        N = 2 * 2**level
        dt = (1.0 / N) ** 1.5
        Tf = cfg["spatial_Tf"]
    else:
        tcfg = cfg["temporal"]
        dt = tcfg["base_dt"] / 2**level
        n_of_dt = tcfg.get("N_of_dt")
        N = n_of_dt(dt) if n_of_dt is not None else tcfg["N"]
        Tf = tcfg["Tf"]
    t0 = time.time()
    trial = _make_trial(
        cfg["case_cls"], N, 50.0, mc=mc,
        krylov_unroll=_study_unroll(cfg, N, dt, mc), precision="full",
    )
    e64 = float(trial.run_for_errors(Tf=Tf, dt=dt).overall_combined_error)
    rel = abs(e64 - mixed_error) / max(abs(e64), 1e-300)
    return dict(
        level=level, N=N, f64_error=e64, mixed_error=mixed_error,
        mixed_vs_f64_rel=rel, wallclock_s=round(time.time() - t0, 1),
    )


#: Fast-mode temporal ladders pinned to precision=full, by MEASUREMENT
#: (2026-08-19, attached chip): the MIXED traced-dt shared-compile expsin
#: temporal program floors at ~2.7e-7 across every dt level on the axon TPU
#: while the on-chip f64 spot-check is clean (8.1798502e-8 = reference) and
#: CPU x64 reproduces the reference exactly in BOTH program shapes — i.e.
#: the known program-shape-dependent f64-emulation noise (CLAUDE.md), in
#: the mixed traced-dt shape for this case.  The adjudication gate caught
#: it (max_rel_dev 2.29 → CPU PASS at 4.2e-11); the pin keeps the archived
#: TPU number itself on the healthy program shape.
TEMPORAL_F64_PIN = {"expsin"}


def main():
    device = str(jax.devices()[0])
    t_start = time.time()

    # Default reproduction mode (VERDICT r3 task 10): precision="mixed"
    # (f64-accurate refinement around native-f32 Krylov — reproduces the
    # f64 study errors to ~1e-11 relative at a fraction of the emulated-f64
    # compile/run cost) with BATCHED spatial ladders (pad-to-max + vmap,
    # ONE compile per ladder).  `--f64` restores the round-3 full-f64
    # per-level behavior for certification refreshes.
    fast = "--f64" not in sys.argv
    if fast:
        os.environ["NA_DD_TPU_PRECISION"] = "mixed"
        print("mode: FAST (precision=mixed, batched spatial ladders; "
              "--f64 for the full-f64 per-level mode)", flush=True)

    # --only <study> [<kind>]: re-run a subset (results merge into the same
    # archive; REPRODUCTION.md is re-rendered from ALL archived JSONs)
    only_study = only_kind = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--only requires a study name (and optionally a kind)")
        only_study = sys.argv[i + 1]
        only_kind = sys.argv[i + 2] if i + 2 < len(sys.argv) else None
        matches = [
            (s, k) for s, k, _ in PLAN
            if s == only_study and (only_kind is None or k == only_kind)
        ]
        if not matches:
            known = sorted({s for s, _, _ in PLAN})
            raise SystemExit(
                f"--only {only_study}{' ' + only_kind if only_kind else ''} "
                f"matches nothing in the PLAN; studies: {known}"
            )

    for study, kind, kwargs in PLAN:
        if only_study and (study != only_study or (only_kind and kind != only_kind)):
            continue
        print(f"\n########## {study} / {kind} ##########", flush=True)
        t0 = time.time()
        try:
            if kind == "spatial":
                if fast:
                    from na_dd_tpu.harness.batched_ladder import (
                        run_spatial_ladder_batched,
                    )

                    res = run_spatial_ladder_batched(
                        study, measure_steady=True, **kwargs
                    )
                    res["kind"] = "spatial"  # same protocol, batched program
                    res["batched"] = True
                else:
                    res = run_spatial_study(study, measure_steady=True, **kwargs)
            elif kind == "temporal":
                # Traced-dt padded-scan mode: one XLA compile per grid size
                # instead of per dt level (~4x fewer temporal compiles).
                # TPU-validated 2026-08: pol temporal shared-vs-baked agree
                # to <=3e-11 relative per level.  NA_DD_SHARED_COMPILE=0
                # restores per-level baked-dt programs.
                shared = os.environ.get("NA_DD_SHARED_COMPILE", "1") != "0"
                pin_f64 = fast and study in TEMPORAL_F64_PIN
                if pin_f64:
                    os.environ["NA_DD_TPU_PRECISION"] = "full"
                try:
                    res = run_temporal_study(
                        study, measure_steady=True, shared_compile=shared,
                        **kwargs,
                    )
                finally:
                    if pin_f64:
                        os.environ["NA_DD_TPU_PRECISION"] = "mixed"
                if pin_f64:
                    res["precision_pin"] = "full"
            else:
                # all eta values in one vmapped program (reference loops them)
                res = run_eta_study_batched(study, **kwargs)
        except Exception:
            traceback.print_exc()
            continue
        res["total_wallclock_s"] = time.time() - t0
        res["precision"] = res.pop(
            "precision_pin", "mixed" if fast else "full"
        )
        if fast and kind in ("spatial", "temporal"):
            try:
                res["f64_spotcheck"] = _f64_spotcheck(
                    study, kind, len(res["errors"]) - 1, res["errors"][-1]
                )
                print(f"  [f64 spot-check] {res['f64_spotcheck']}", flush=True)
            except Exception:
                traceback.print_exc()

        ref_errors = REFERENCE_ERRORS.get((study, kind.replace("eta_batched", "eta")))
        if ref_errors:
            res["reference_errors"] = ref_errors
            res["max_rel_dev_vs_reference"] = _max_rel_dev(res["errors"], ref_errors)
            if res["max_rel_dev_vs_reference"] > PARITY_GATE:
                res["adjudication"] = _adjudicate(res, ref_errors)
                v = res["adjudication"]
                if v.get("status") == "ok":
                    print(
                        f"  [adjudicate] level {v['level']}: CPU x64 err "
                        f"{v['cpu_error']:.6e} vs ref {v['reference']:.3e} "
                        f"(rel {v['cpu_rel_dev']:.2e}) -> "
                        f"{'PASS' if v['passed'] else 'FAIL'}",
                        flush=True,
                    )
                else:
                    print(f"  [adjudicate] {v}", flush=True)
        _save_json(res)
        print(
            f"########## done {study}/{kind} in {res['total_wallclock_s']:.1f}s "
            f"max_rel_dev={res.get('max_rel_dev_vs_reference', float('nan')):.2e}",
            flush=True,
        )

    # ---- REPRODUCTION.md (rendered from the archived JSONs so interrupted
    # runs can regenerate it too: python studies/write_reproduction.py) ----
    from studies.write_reproduction import write_report

    path = write_report(device=device, total_s=time.time() - t_start)
    print(f"\nwrote {path}", flush=True)


if __name__ == "__main__":
    main()
