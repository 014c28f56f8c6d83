#!/usr/bin/env python
"""Does mixed precision fix the peaks tier-8 drift on TPU?

Background (harness/studies.py peaks registry comment + CLAUDE.md): on the
axon TPU the peaks spatial level N=128 at the generic tier-8 Krylov budget
deviates 2.2e-2 from the CPU-exact value (5.7e-8 at budget 16) with every
solve reporting converged — a program-shape-dependent f64-EMULATION effect
(scan-fusion lowering, studies/scan_fusion_synthetic_repro.py), hence the
pinned min_krylov_unroll=16.

precision="mixed" moves every Krylov iteration into NATIVE f32 (no f64
emulation in the iteration loop) and recovers f64 accuracy by f64-residual
refinement.  If the drift mechanism is the emulated-f64 Krylov fusion, the
mixed mode should be exact at budget 8 — allowing the pin to be dropped for
mixed-mode runs and confirming the mechanism.

Usage:  python studies/mixed_peaks_probe.py [N] [budget]
Prints per-config errors vs the per-level CPU-certified reference value.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from na_dd_tpu.config import enable_persistent_compilation_cache, setup_x64

setup_x64()
enable_persistent_compilation_cache()

import math
import time

from na_dd_tpu.harness.studies import STUDIES, _make_trial, study_consts


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    study = "peaks_fast1e1"
    cfg = STUDIES[study]
    mc = study_consts(study)
    Tf = cfg["spatial_Tf"]
    dt = (1.0 / N) ** 1.5
    dt = Tf / math.ceil(Tf / dt)

    results = {}
    for label, kw in [
        (f"full/unroll{budget}", dict(krylov_unroll=budget)),
        (f"mixed/unroll{budget}", dict(krylov_unroll=budget, precision="mixed")),
    ]:
        trial = _make_trial(cfg["case_cls"], N, 50.0, mc=mc, **kw)
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        summary = trial.run_for_errors(Tf=Tf, dt=dt)
        steady = time.perf_counter() - t0
        err = float(summary.overall_combined_error)
        results[label] = err
        print(f"  {label:18s} err={err:.10e}  (first {wall:.1f}s, steady {steady:.2f}s)",
              flush=True)

    full, mixed = results[f"full/unroll{budget}"], results[f"mixed/unroll{budget}"]
    rel = abs(mixed - full) / full
    print(f"  mixed-vs-full relative deviation: {rel:.3e}")

    import math as _math

    from studies.reference_values import REFERENCE_ERRORS

    level = int(_math.log2(N // 2))
    ref = REFERENCE_ERRORS[(study, "spatial")][level]
    for label, err in results.items():
        print(f"  {label:18s} vs reference {ref:.6e}: rel {abs(err - ref) / ref:.3e}")


if __name__ == "__main__":
    main()
